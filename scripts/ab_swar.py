"""Diagnose the SWAR-word classify failure: was it the arithmetic or the
outside u8->i32 bitcast (a physical byte shuffle per iteration)?

  s0  production v3 kernel, u8 inputs
  s1  SWAR word kernel, i32 inputs fed directly (no bitcast in the loop),
      mul-based per-word counts
  s2  same, shift-add counts (no 32-bit multiply)
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

from wgatools_tpu.ops.classify import N_STATS, classify_stat_pallas  # noqa: E402

_HI_I = int(np.int32(np.uint32(0x80808080)))
_GAPW_I = 0x2D2D2D2D


def _lsr(x, k):
    return lax.shift_right_logical(x, jnp.int32(k))


def _nz_hi(x):
    y = (x & jnp.int32(0x7F7F7F7F)) + jnp.int32(0x7F7F7F7F)
    return (y | x) & jnp.int32(_HI_I)


def _make_kernel(mulcount):
    def kern(t_ref, q_ref, out_ref):
        j = pl.program_id(1)
        tw = t_ref[:]
        qw = q_ref[:]
        HI = jnp.int32(_HI_I)
        GAPW = jnp.int32(_GAPW_I)
        eq_hi = HI & ~_nz_hi(tw ^ qw)
        ti_hi = HI & ~_nz_hi(tw ^ GAPW)
        qi_hi = HI & ~_nz_hi(qw ^ GAPW)
        ne = HI & ~eq_hi
        i_hi = ti_hi & ne
        d_hi = qi_hi & ~ti_hi & ne
        x_hi = ne & ~ti_hi & ~qi_hi
        gg_hi = ti_hi & qi_hi
        catw = _lsr(x_hi, 7) | _lsr(i_hi, 6) | (_lsr(d_hi, 6) | _lsr(d_hi, 7))
        carried = _lsr(pltpu.roll(catw, 1, axis=1), 24) & jnp.int32(0xFF)
        prevw = (catw << 8) | carried
        diff = catw ^ prevw
        first_word = jax.lax.broadcasted_iota(jnp.int32, tw.shape, 1) == 0
        diff = diff | jnp.where(first_word, jnp.int32(0x80), jnp.int32(0))
        rs_hi = _nz_hi(diff)

        if mulcount:
            def cnt(m):
                return _lsr(_lsr(m, 7) * jnp.int32(0x01010101), 24)
        else:
            def cnt(m):
                o = _lsr(m, 7)
                o = o + _lsr(o, 8)
                o = o + _lsr(o, 16)
                return o & jnp.int32(0xFF)

        f0 = cnt(eq_hi) + (cnt(x_hi) << 16)
        f1 = cnt(i_hi) + (cnt(d_hi) << 16)
        f2 = cnt(i_hi & rs_hi) + (cnt(d_hi & rs_hi) << 16)
        f3 = cnt(gg_hi) + (cnt(rs_hi) << 16)
        i32 = jnp.int32
        s0 = jnp.sum(f0, axis=1, dtype=i32)
        s1 = jnp.sum(f1, axis=1, dtype=i32)
        s2 = jnp.sum(f2, axis=1, dtype=i32)
        s3 = jnp.sum(f3, axis=1, dtype=i32)
        mask = jnp.int32(0xFFFF)
        stats = jnp.stack(
            [
                (s0 & mask), (s0 >> 16) & mask,
                (s1 & mask), (s1 >> 16) & mask,
                (s2 & mask), (s2 >> 16) & mask,
                (s3 & mask), (s3 >> 16) & mask,
            ],
            axis=1,
        )

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += stats

    return kern


def make_swar_call(kernel, B, LW, tile_b=8, tile_lw=8192):
    grid = (B // tile_b, LW // tile_lw)
    spec = pl.BlockSpec(
        (tile_b, tile_lw), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    ospec = pl.BlockSpec(
        (tile_b, N_STATS), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )

    @jax.jit
    def call(tw, qw):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec, spec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B, N_STATS), jnp.int32),
        )(tw, qw)

    return call


def main():
    B, L = 32, 1 << 22
    LW = L // 4
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)
    t0 = alphabet[rng.integers(0, 5, size=(B, L))]
    q0 = alphabet[rng.integers(0, 5, size=(B, L))]
    t_d = jax.device_put(jnp.asarray(t0))
    q_d = jax.device_put(jnp.asarray(q0))
    tw_d = jax.device_put(jnp.asarray(t0.view("<i4")))
    qw_d = jax.device_put(jnp.asarray(q0.view("<i4")))
    lens_d = jax.device_put(jnp.full(B, L, dtype=jnp.int32))

    c_v3 = lambda t, q: classify_stat_pallas(t, q, lens_d)
    c_s1 = make_swar_call(_make_kernel(True), B, LW)
    c_s2 = make_swar_call(_make_kernel(False), B, LW)

    # timing-only: the SWAR kernels force per-tile run starts without the
    # production wrapper's edge corrections, so istart/dstart/runs differ
    # by the tile count; equality was verified for the corrected v4 in
    # ab_classify.py.  s1 must equal s2 exactly though.
    want = np.asarray(c_s1(tw_d, qw_d))
    got = np.asarray(c_s2(tw_d, qw_d))
    assert np.array_equal(got, want)
    np.asarray(c_v3(t_d, q_d))
    print("s1 == s2", file=sys.stderr)

    def make_runner(call, word):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(t, q, iters):
            def body(_, carry):
                t, acc = carry
                acc = acc + jnp.sum(call(t, q))
                if word:
                    t = t.at[0, 0].set(jnp.int32(0x41414141) + (acc & 3))
                else:
                    t = t.at[0, 0].set(
                        (acc & 3).astype(jnp.uint8) + jnp.uint8(65)
                    )
                return (t, acc)

            _, acc = lax.fori_loop(0, iters, body, (t, jnp.int32(0)))
            return acc

        return run_iters

    runners = {
        "v3_prod": (make_runner(c_v3, False), t_d, q_d),
        "s1_mul": (make_runner(c_s1, True), tw_d, qw_d),
        "s2_shift": (make_runner(c_s2, True), tw_d, qw_d),
    }
    LO, HI = 4, 36

    def run_batch(r, a, b, iters):
        start = time.perf_counter()
        cs = int(np.asarray(r(a, b, iters)))
        assert cs != 0
        return time.perf_counter() - start

    for n, (r, a, b) in runners.items():
        print(f"warm {n}", file=sys.stderr)
        run_batch(r, a, b, LO)
        run_batch(r, a, b, HI)

    lo_t = {n: [] for n in runners}
    hi_t = {n: [] for n in runners}
    for rd in range(7):
        for n, (r, a, b) in runners.items():
            lo_t[n].append(run_batch(r, a, b, LO))
            hi_t[n].append(run_batch(r, a, b, HI))
        print(f"round {rd} done", file=sys.stderr)

    for n in runners:
        tl, th = min(lo_t[n]), min(hi_t[n])
        rate = B * L * (HI - LO) / (th - tl) / 1e9 if th > tl else float("nan")
        print(f"{n:10s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
