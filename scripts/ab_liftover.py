"""Same-process A/B of liftover-scan kernel variants on the real chip.

Variants (bit-identical outputs):
  L0  production kernel (ops.liftover.liftover_scan_pallas, tile (32,512))
  L1  stacked: both scans x both limbs in ONE (4*TB, TL) matmul per tile
      (full MXU row utilization; 1 dispatch instead of 4)
  L2  two-level: in-kernel reshape (TB,TL)->(TB*ns, c), chunk-local scan
      via (c,c) triangle (c=128: 4x fewer MACs/element), chunk offsets
      recombined with unrolled adds
"""

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

OP_I, OP_D, OP_S = ord("I"), ord("D"), ord("S")


def _advances(ops, lens):
    i32 = jnp.int32
    pad = ops.astype(i32) == 0
    is_i = (ops ^ jnp.uint8(OP_I)).astype(i32) == 0
    is_s = (ops ^ jnp.uint8(OP_S)).astype(i32) == 0
    is_d = (ops ^ jnp.uint8(OP_D)).astype(i32) == 0
    adv_t = jnp.where(pad | is_i | is_s, 0, lens)
    adv_q = jnp.where(pad | is_d, 0, lens)
    return adv_t, adv_q


def _advances_1w(ops, lens):
    # single widen, constant compares (classify v2 lesson)
    o32 = ops.astype(jnp.int32)
    pad = o32 == 0
    is_i = o32 == OP_I
    is_s = o32 == OP_S
    is_d = o32 == OP_D
    adv_t = jnp.where(pad | is_i | is_s, 0, lens)
    adv_q = jnp.where(pad | is_d, 0, lens)
    return adv_t, adv_q


def _kernel_l1b(ops_ref, lens_ref, tri_ref, t_ref, q_ref, carry_ref):
    """l1 with single-widen advance selection."""
    j = pl.program_id(1)
    adv_t, adv_q = _advances_1w(ops_ref[:], lens_ref[:])
    tri_x = tri_ref[:]
    TL = adv_t.shape[1]
    i32 = jnp.int32

    stacked = jnp.concatenate(
        [
            (adv_t & 0xFF).astype(jnp.bfloat16),
            (adv_t >> 8).astype(jnp.bfloat16),
            (adv_q & 0xFF).astype(jnp.bfloat16),
            (adv_q >> 8).astype(jnp.bfloat16),
        ],
        axis=0,
    )
    s = jax.lax.dot_general(
        stacked, tri_x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(i32)
    TB = adv_t.shape[0]

    @pl.when(j == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    carry = carry_ref[:]
    ex_t = s[:TB] + (s[TB : 2 * TB] << 8) + carry[:, 0:1]
    ex_q = s[2 * TB : 3 * TB] + (s[3 * TB :] << 8) + carry[:, 1:2]
    t_ref[:] = ex_t
    q_ref[:] = ex_q
    carry_ref[:] = jnp.concatenate(
        [
            ex_t[:, TL - 1 : TL] + adv_t[:, TL - 1 : TL],
            ex_q[:, TL - 1 : TL] + adv_q[:, TL - 1 : TL],
        ],
        axis=1,
    )


def _kernel_l1(ops_ref, lens_ref, tri_ref, t_ref, q_ref, carry_ref):
    """One stacked (4*TB, TL) x (TL, TL) matmul per tile."""
    j = pl.program_id(1)
    adv_t, adv_q = _advances(ops_ref[:], lens_ref[:])
    tri_x = tri_ref[:]
    TL = adv_t.shape[1]
    i32 = jnp.int32

    stacked = jnp.concatenate(
        [
            (adv_t & 0xFF).astype(jnp.bfloat16),
            (adv_t >> 8).astype(jnp.bfloat16),
            (adv_q & 0xFF).astype(jnp.bfloat16),
            (adv_q >> 8).astype(jnp.bfloat16),
        ],
        axis=0,
    )
    s = jax.lax.dot_general(
        stacked, tri_x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(i32)
    TB = adv_t.shape[0]
    ex_t = s[:TB] + (s[TB : 2 * TB] << 8)
    ex_q = s[2 * TB : 3 * TB] + (s[3 * TB :] << 8)

    @pl.when(j == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    carry = carry_ref[:]
    ex_t = ex_t + carry[:, 0:1]
    ex_q = ex_q + carry[:, 1:2]
    t_ref[:] = ex_t
    q_ref[:] = ex_q
    carry_ref[:] = jnp.concatenate(
        [
            ex_t[:, TL - 1 : TL] + adv_t[:, TL - 1 : TL],
            ex_q[:, TL - 1 : TL] + adv_q[:, TL - 1 : TL],
        ],
        axis=1,
    )


def _kernel_l2(ops_ref, lens_ref, tri_ref, t_ref, q_ref, carry_ref, *, c):
    """Two-level: reshape rows into ns chunks of c, chunk-scan via a (c,c)
    triangle, then unrolled chunk-offset recombination."""
    j = pl.program_id(1)
    adv_t, adv_q = _advances(ops_ref[:], lens_ref[:])
    tri_x = tri_ref[:]
    TB, TL = adv_t.shape
    ns = TL // c
    i32 = jnp.int32

    at = adv_t.reshape(TB * ns, c)
    aq = adv_q.reshape(TB * ns, c)
    stacked = jnp.concatenate(
        [
            (at & 0xFF).astype(jnp.bfloat16),
            (at >> 8).astype(jnp.bfloat16),
            (aq & 0xFF).astype(jnp.bfloat16),
            (aq >> 8).astype(jnp.bfloat16),
        ],
        axis=0,
    )
    s = jax.lax.dot_general(
        stacked, tri_x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(i32)
    R = TB * ns
    ex_t = s[:R] + (s[R : 2 * R] << 8)          # (TB*ns, c) chunk-local
    ex_q = s[2 * R : 3 * R] + (s[3 * R :] << 8)

    # chunk totals, recombined per row with unrolled adds (ns is small)
    tot_t = ex_t[:, c - 1 : c] + at[:, c - 1 : c]   # (TB*ns, 1)
    tot_q = ex_q[:, c - 1 : c] + aq[:, c - 1 : c]
    ex_t = ex_t.reshape(TB, ns, c)
    ex_q = ex_q.reshape(TB, ns, c)
    tt = tot_t.reshape(TB, ns)
    tq = tot_q.reshape(TB, ns)
    # exclusive prefix over the ns chunks
    offs_t = [jnp.zeros((TB, 1), i32)]
    offs_q = [jnp.zeros((TB, 1), i32)]
    for k in range(1, ns):
        offs_t.append(offs_t[-1] + tt[:, k - 1 : k])
        offs_q.append(offs_q[-1] + tq[:, k - 1 : k])
    off_t = jnp.stack([o[:, 0] for o in offs_t], axis=1)  # (TB, ns)
    off_q = jnp.stack([o[:, 0] for o in offs_q], axis=1)

    ex_t = (ex_t + off_t[:, :, None]).reshape(TB, TL)
    ex_q = (ex_q + off_q[:, :, None]).reshape(TB, TL)

    @pl.when(j == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    carry = carry_ref[:]
    adv_t_last = adv_t[:, TL - 1 : TL]
    adv_q_last = adv_q[:, TL - 1 : TL]
    ex_t = ex_t + carry[:, 0:1]
    ex_q = ex_q + carry[:, 1:2]
    t_ref[:] = ex_t
    q_ref[:] = ex_q
    carry_ref[:] = jnp.concatenate(
        [
            ex_t[:, TL - 1 : TL] + adv_t_last,
            ex_q[:, TL - 1 : TL] + adv_q_last,
        ],
        axis=1,
    )


def make_call(kernel, B, N, tile_b, tile_l, tri_n, interpret=False):
    grid = (B // tile_b, N // tile_l)
    spec = pl.BlockSpec(
        (tile_b, tile_l), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )

    @jax.jit
    def call(ops, lens):
        ir = jax.lax.broadcasted_iota(jnp.int32, (tri_n, tri_n), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (tri_n, tri_n), 1)
        tri = jnp.clip(ir - ic, 0, 1).astype(jnp.bfloat16)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                spec,
                spec,
                pl.BlockSpec(
                    (tri_n, tri_n), lambda i, j: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((B, N), jnp.int32),
                jax.ShapeDtypeStruct((B, N), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((tile_b, 2), jnp.int32)],
            interpret=interpret,
        )(ops, lens.astype(jnp.int32), tri)

    return call


def build(B, N, interpret=False):
    from wgatools_tpu.ops.liftover import liftover_scan_pallas

    calls = {}
    calls["l0_prod"] = functools.partial(
        liftover_scan_pallas, interpret=interpret
    )
    calls["l1_stack"] = make_call(
        _kernel_l1, B, N, 32, 512, 512, interpret
    )
    calls["l2_2level"] = make_call(
        functools.partial(_kernel_l2, c=128), B, N, 32, 512, 128, interpret
    )
    calls["l1b_1widen"] = make_call(
        _kernel_l1b, B, N, 32, 512, 512, interpret
    )
    calls["l1b_1024"] = make_call(
        _kernel_l1b, B, N, 32, 1024, 1024, interpret
    )
    return calls


def main():
    B, N = 32, 1 << 17
    rng = np.random.default_rng(0)
    op_chars = np.frombuffer(b"M=XID", dtype=np.uint8)
    ops = op_chars[rng.integers(0, 5, size=(B, N))]
    lens = rng.integers(1, 100, size=(B, N)).astype(np.int32)
    o_d = jax.device_put(jnp.asarray(ops))
    l_d = jax.device_put(jnp.asarray(lens))

    interpret = jax.default_backend() != "tpu"
    calls = build(B, N, interpret)

    ref = None
    for name, call in calls.items():
        t_off, q_off = call(o_d, l_d)
        got = (np.asarray(t_off), np.asarray(q_off))
        if ref is None:
            ref = got
        else:
            assert np.array_equal(got[0], ref[0]) and np.array_equal(
                got[1], ref[1]
            ), f"{name} mismatch\n{got[0][:1,:8]}\n{ref[0][:1,:8]}"
    print("all variants bit-identical", file=sys.stderr)
    if interpret:
        print("CPU interpret mode: correctness only")
        return

    def make_runner(call):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(o, ln, iters):
            def body(_, carry):
                ln, acc = carry
                t_off, q_off = call(o, ln)
                acc = (
                    acc
                    + jnp.sum(t_off[:, ::512])
                    + jnp.sum(q_off[:, ::512])
                )
                ln = ln.at[0, 0].set(jnp.int32(1) + (acc & 7))
                return (ln, acc)

            _, acc = lax.fori_loop(0, iters, body, (ln, jnp.int32(0)))
            return acc

        return run_iters

    runners = {n: make_runner(c) for n, c in calls.items()}
    LO, HI = 16, 160

    def run_batch(r, iters):
        start = time.perf_counter()
        cs = int(np.asarray(r(o_d, l_d, iters)))
        assert cs != 0
        return time.perf_counter() - start

    for name, r in runners.items():
        print(f"warm {name}", file=sys.stderr)
        run_batch(r, LO)
        run_batch(r, HI)

    lo_t = {n: [] for n in runners}
    hi_t = {n: [] for n in runners}
    for rd in range(5):
        for name, r in runners.items():
            lo_t[name].append(run_batch(r, LO))
            hi_t[name].append(run_batch(r, HI))
        print(f"round {rd} done", file=sys.stderr)

    for name in runners:
        tl, th = min(lo_t[name]), min(hi_t[name])
        rate = B * N * (HI - LO) / (th - tl) / 1e9 if th > tl else float("nan")
        print(f"{name:12s} marginal {rate:8.1f} Gop/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
