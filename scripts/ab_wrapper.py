"""Same-process A/B: old classify wrapper (tile-forced run starts +
external edge-gather corrections) vs the new carry-scratch wrapper
(production).  Full production semantics on both sides."""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from wgatools_tpu.ops.classify import (  # noqa: E402
    GAP,
    EQ,
    X,
    I,
    D,
    W,
    N_STATS,
    STAT_RUNS,
    STAT_INS_EVENT,
    STAT_DEL_EVENT,
    STAT_MATCHED,
    STAT_GAPGAP,
    _classify,
    classify_stat_pallas,
)


def _old_kernel(t_ref, q_ref, out_ref, *, caller=False):
    j = pl.program_id(1)
    t32 = t_ref[:].astype(jnp.int32)
    q32 = q_ref[:].astype(jnp.int32)
    gap = jnp.int32(GAP)
    eq = (t32 ^ q32) == 0
    ti = (t32 ^ gap) == 0
    qi = (q32 ^ gap) == 0
    cat = jnp.where(eq, EQ, jnp.where(ti, I, jnp.where(qi, D, X)))
    is_eq = eq
    gg = ti & qi
    prev_cat = pltpu.roll(cat, 1, axis=1)
    first_col = jax.lax.broadcasted_iota(jnp.int32, t32.shape, 1) == 0
    run_start = first_col | (cat != prev_cat)
    is_i = cat == I
    is_d = cat == D
    one = jnp.int32(1)
    zero = jnp.int32(0)

    def b(m):
        return jnp.where(m, one, zero)

    f0 = b(is_eq) + (b(cat == X) << 16)
    f1 = b(is_i) + (b(is_d) << 16)
    f2 = b(is_i & run_start) + (b(is_d & run_start) << 16)
    f3 = b(gg) + (b(run_start) << 16)
    i32 = jnp.int32
    s0 = jnp.sum(f0, axis=1, dtype=i32)
    s1 = jnp.sum(f1, axis=1, dtype=i32)
    s2 = jnp.sum(f2, axis=1, dtype=i32)
    s3 = jnp.sum(f3, axis=1, dtype=i32)
    mask = jnp.int32(0xFFFF)
    stats = jnp.stack(
        [
            (s0 & mask),
            (s0 >> 16) & mask,
            (s1 & mask),
            (s1 >> 16) & mask,
            (s2 & mask),
            (s2 >> 16) & mask,
            (s3 & mask),
            (s3 >> 16) & mask,
        ],
        axis=1,
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += stats


@functools.partial(jax.jit, static_argnames=("tile_b", "tile_l"))
def old_wrapper(t, q, lengths, tile_b=8, tile_l=32768):
    B, L = t.shape
    nb = pl.cdiv(B, tile_b)
    nl = pl.cdiv(L, tile_l)
    out = pl.pallas_call(
        _old_kernel,
        grid=(nb, nl),
        in_specs=[
            pl.BlockSpec(
                (tile_b, tile_l), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_b, tile_l), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, N_STATS), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N_STATS), jnp.int32),
    )(t, q)

    corr = jnp.zeros((B, N_STATS), dtype=jnp.int32)
    if nl > 1:
        edge = jnp.arange(1, nl) * tile_l
        last_cat = _classify(t[:, edge - 1], q[:, edge - 1], False).astype(
            jnp.int32
        )
        first_cat = _classify(t[:, edge], q[:, edge], False).astype(jnp.int32)
        cont = last_cat == first_cat
        corr = corr.at[:, STAT_RUNS].add(jnp.sum(cont, axis=1, dtype=jnp.int32))
        corr = corr.at[:, STAT_INS_EVENT].add(
            jnp.sum(cont & (first_cat == I), axis=1, dtype=jnp.int32)
        )
        corr = corr.at[:, STAT_DEL_EVENT].add(
            jnp.sum(cont & (first_cat == D), axis=1, dtype=jnp.int32)
        )
    pad = (L - lengths).astype(jnp.int32)
    corr = corr.at[:, STAT_MATCHED].add(pad)
    corr = corr.at[:, STAT_GAPGAP].add(pad)
    last_idx = jnp.maximum(lengths - 1, 0)
    last_real_cat = _classify(
        jnp.take_along_axis(t, last_idx[:, None], axis=1),
        jnp.take_along_axis(q, last_idx[:, None], axis=1),
        False,
    )[:, 0].astype(jnp.int32)
    has_pad = lengths < L
    merged = (lengths > 0) & (last_real_cat == EQ)
    corr = corr.at[:, STAT_RUNS].add(
        jnp.where(has_pad & ~merged, 1, 0).astype(jnp.int32)
    )
    return out - corr


def main():
    B, L = 32, 1 << 22
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)
    t0 = alphabet[rng.integers(0, 5, size=(B, L))]
    q0 = alphabet[rng.integers(0, 5, size=(B, L))]
    t_d = jax.device_put(jnp.asarray(t0))
    q_d = jax.device_put(jnp.asarray(q0))
    lens_d = jax.device_put(jnp.full(B, L, dtype=jnp.int32))

    import functools as ft

    @jax.jit
    def raw_nocorr(t, q):
        B, L = t.shape
        tile_b, tile_l = 8, 32768
        out, edges = pl.pallas_call(
            ft.partial(
                __import__("wgatools_tpu.ops.classify", fromlist=["_kernel"])._kernel,
                caller=False,
            ),
            grid=(B // tile_b, L // tile_l),
            in_specs=[
                pl.BlockSpec((tile_b, tile_l), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, tile_l), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_b, N_STATS), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, 128), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, N_STATS), jnp.int32),
                jax.ShapeDtypeStruct((B, 128 * (L // tile_l)), jnp.int32),
            ],
        )(t, q)
        return out

    @jax.jit
    def no_padgather(t, q):
        # full wrapper minus the two take_along_axis single-column gathers
        B, L = t.shape
        out = raw_nocorr(t, q)
        corr = jnp.zeros((B, N_STATS), dtype=jnp.int32)
        pad = (L - lens_d).astype(jnp.int32)
        corr = corr.at[:, STAT_MATCHED].add(pad)
        corr = corr.at[:, STAT_GAPGAP].add(pad)
        return out - corr

    calls = {
        "old_edgecorr": lambda t, q: old_wrapper(t, q, lens_d),
        "new_edgeout": lambda t, q: classify_stat_pallas(t, q, lens_d),
        "raw_nocorr": raw_nocorr,
        "no_padgather": no_padgather,
    }

    ref = None
    for name, call in calls.items():
        if name in ("raw_nocorr", "no_padgather"):
            np.asarray(call(t_d, q_d))  # timing-only variants
            continue
        got = np.asarray(call(t_d, q_d))
        if ref is None:
            ref = got
        else:
            assert np.array_equal(got, ref), name
    print("wrappers bit-identical", file=sys.stderr)

    def make_runner(call):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(t, q, iters):
            def body(_, carry):
                t, acc = carry
                acc = acc + jnp.sum(call(t, q))
                t = t.at[0, 0].set((acc & 3).astype(jnp.uint8) + jnp.uint8(65))
                return (t, acc)

            _, acc = lax.fori_loop(0, iters, body, (t, jnp.int32(0)))
            return acc

        return run_iters

    runners = {n: make_runner(c) for n, c in calls.items()}
    LO, HI = 4, 40

    def run_batch(r, iters):
        start = time.perf_counter()
        cs = int(np.asarray(r(t_d, q_d, iters)))
        assert cs != 0
        return time.perf_counter() - start

    for n, r in runners.items():
        print(f"warm {n}", file=sys.stderr)
        run_batch(r, LO)
        run_batch(r, HI)

    lo_t = {n: [] for n in runners}
    hi_t = {n: [] for n in runners}
    for rd in range(7):
        for n, r in runners.items():
            lo_t[n].append(run_batch(r, LO))
            hi_t[n].append(run_batch(r, HI))
        print(f"round {rd} done", file=sys.stderr)

    for n in runners:
        tl, th = min(lo_t[n]), min(hi_t[n])
        dt = (th - tl) / (HI - LO)
        print(
            f"{n:14s} per-iter {dt*1e3:7.3f} ms -> "
            f"{B * L / dt / 1e9:7.1f} Gcol/s"
        )


if __name__ == "__main__":
    main()
