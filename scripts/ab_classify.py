"""Same-process A/B of classify-kernel variants on the real chip.

Ambient load on the shared v5e swings isolated runs ~4x, so variants are
timed ALTERNATING within one process and compared by marginal rate
(bench.py methodology: single-dispatch fori_loop with checksum feedback).

Variants (all must produce bit-identical raw tile sums):
  v0  current production kernel (ops.classify._kernel)
  v1  packed-field reduction: 2x16-bit counters per uint32, 4 sums not 8
  v2  fused classify: 2 widens (t,q -> i32), shared ti/qi, run_start reuse
  v3  v1 + v2 combined
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

GAP = ord("-")
EQ, X, I, D = 0, 1, 2, 3
N_STATS = 8


def _classify_v0(t, q):
    eq = (t ^ q).astype(jnp.int32) == 0
    ti = (t ^ jnp.uint8(GAP)).astype(jnp.int32) == 0
    qi = (q ^ jnp.uint8(GAP)).astype(jnp.int32) == 0
    return jnp.where(eq, EQ, jnp.where(ti, I, jnp.where(qi, D, X))).astype(
        jnp.uint8
    )


def _gapgap_v0(t, q):
    ti = (t ^ jnp.uint8(GAP)).astype(jnp.int32) == 0
    qi = (q ^ jnp.uint8(GAP)).astype(jnp.int32) == 0
    return ti & qi


def _kernel_v0(t_ref, q_ref, out_ref):
    j = pl.program_id(1)
    t = t_ref[:]
    q = q_ref[:]
    cat = _classify_v0(t, q).astype(jnp.int32)
    prev_cat = pltpu.roll(cat, 1, axis=1)
    first_col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) == 0
    is_i = cat == I
    is_d = cat == D
    i32 = jnp.int32
    stats = jnp.stack(
        [
            jnp.sum(cat == EQ, axis=1, dtype=i32),
            jnp.sum(cat == X, axis=1, dtype=i32),
            jnp.sum(is_i, axis=1, dtype=i32),
            jnp.sum(is_d, axis=1, dtype=i32),
            jnp.sum(is_i & (first_col | (prev_cat != I)), axis=1, dtype=i32),
            jnp.sum(is_d & (first_col | (prev_cat != D)), axis=1, dtype=i32),
            jnp.sum(_gapgap_v0(t, q), axis=1, dtype=i32),
            jnp.sum(first_col | (cat != prev_cat), axis=1, dtype=i32),
        ],
        axis=1,
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += stats


def _kernel_v1(t_ref, q_ref, out_ref):
    """Packed-field reduction: 4 uint32 sums carrying 2x16-bit counters.

    Per-tile counts <= tile_l = 32768 < 2^16 so low fields never carry;
    high fields reach at most 32768 << 16 = 2^31 which fits uint32."""
    j = pl.program_id(1)
    t = t_ref[:]
    q = q_ref[:]
    cat = _classify_v0(t, q).astype(jnp.int32)
    prev_cat = pltpu.roll(cat, 1, axis=1)
    first_col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) == 0
    run_start = first_col | (cat != prev_cat)
    is_i = cat == I
    is_d = cat == D
    i32s = jnp.int32
    one = jnp.int32(1)
    zero = jnp.int32(0)

    def b(m):
        return jnp.where(m, one, zero)

    f0 = b(cat == EQ) + (b(cat == X) << 16)
    f1 = b(is_i) + (b(is_d) << 16)
    f2 = b(is_i & run_start) + (b(is_d & run_start) << 16)
    f3 = b(_gapgap_v0(t, q)) + (b(run_start) << 16)
    s0 = jnp.sum(f0, axis=1, dtype=i32s)
    s1 = jnp.sum(f1, axis=1, dtype=i32s)
    s2 = jnp.sum(f2, axis=1, dtype=i32s)
    s3 = jnp.sum(f3, axis=1, dtype=i32s)
    # int32 sums may wrap sign when the high-field count is exactly
    # tile_l = 2^15 (<<16 = 2^31); bit extraction is wrap-safe
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


def _kernel_v2(t_ref, q_ref, out_ref):
    """Fused classify: widen t/q once each, share ti/qi with gapgap,
    i_start = is_i & run_start."""
    j = pl.program_id(1)
    t32 = t_ref[:].astype(jnp.int32)
    q32 = q_ref[:].astype(jnp.int32)
    gap = jnp.int32(GAP)
    eq = (t32 ^ q32) == 0
    ti = (t32 ^ gap) == 0
    qi = (q32 ^ gap) == 0
    cat = jnp.where(eq, EQ, jnp.where(ti, I, jnp.where(qi, D, X)))
    gg = ti & qi
    prev_cat = pltpu.roll(cat, 1, axis=1)
    first_col = jax.lax.broadcasted_iota(jnp.int32, t32.shape, 1) == 0
    run_start = first_col | (cat != prev_cat)
    is_i = cat == I
    is_d = cat == D
    i32 = jnp.int32
    stats = jnp.stack(
        [
            jnp.sum(eq, axis=1, dtype=i32),
            jnp.sum(cat == X, axis=1, dtype=i32),
            jnp.sum(is_i, axis=1, dtype=i32),
            jnp.sum(is_d, axis=1, dtype=i32),
            jnp.sum(is_i & run_start, axis=1, dtype=i32),
            jnp.sum(is_d & run_start, axis=1, dtype=i32),
            jnp.sum(gg, axis=1, dtype=i32),
            jnp.sum(run_start, axis=1, dtype=i32),
        ],
        axis=1,
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += stats


def _kernel_v3(t_ref, q_ref, out_ref):
    j = pl.program_id(1)
    t32 = t_ref[:].astype(jnp.int32)
    q32 = q_ref[:].astype(jnp.int32)
    gap = jnp.int32(GAP)
    eq = (t32 ^ q32) == 0
    ti = (t32 ^ gap) == 0
    qi = (q32 ^ gap) == 0
    cat = jnp.where(eq, EQ, jnp.where(ti, I, jnp.where(qi, D, X)))
    gg = ti & qi
    prev_cat = pltpu.roll(cat, 1, axis=1)
    first_col = jax.lax.broadcasted_iota(jnp.int32, t32.shape, 1) == 0
    run_start = first_col | (cat != prev_cat)
    is_i = cat == I
    is_d = cat == D
    i32s = jnp.int32
    one = jnp.int32(1)
    zero = jnp.int32(0)

    def b(m):
        return jnp.where(m, one, zero)

    f0 = b(eq) + (b(cat == X) << 16)
    f1 = b(is_i) + (b(is_d) << 16)
    f2 = b(is_i & run_start) + (b(is_d & run_start) << 16)
    f3 = b(gg) + (b(run_start) << 16)
    s0 = jnp.sum(f0, axis=1, dtype=i32s)
    s1 = jnp.sum(f1, axis=1, dtype=i32s)
    s2 = jnp.sum(f2, axis=1, dtype=i32s)
    s3 = jnp.sum(f3, axis=1, dtype=i32s)
    # int32 sums may wrap sign when the high-field count is exactly
    # tile_l = 2^15 (<<16 = 2^31); bit extraction is wrap-safe
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


KERNELS = {
    "v0": _kernel_v0,
    "v2_fused": _kernel_v2,
    "v3_both": _kernel_v3,
}


def make_call(kernel, B, L, tile_b=8, tile_l=32768):
    grid = (B // tile_b, L // tile_l)
    spec = pl.BlockSpec(
        (tile_b, tile_l), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    ospec = pl.BlockSpec(
        (tile_b, N_STATS), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )

    @jax.jit
    def call(t, q):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec, spec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B, N_STATS), jnp.int32),
        )(t, q)

    return call


def main():
    B, L = 32, 1 << 22
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)
    t0 = alphabet[rng.integers(0, 5, size=(B, L))]
    q0 = alphabet[rng.integers(0, 5, size=(B, L))]
    t_d = jax.device_put(jnp.asarray(t0))
    q_d = jax.device_put(jnp.asarray(q0))

    calls = {name: make_call(k, B, L) for name, k in KERNELS.items()}
    # v4 (SWAR words) measured 6.9 Gcol/s on-chip -- Mosaic lowers the
    # i32 SWAR arithmetic poorly; dropped.  v1 never beat v0 alone.

    # correctness: raw tile sums must be identical across variants
    ref = np.asarray(calls["v0"](t_d, q_d))
    for name, call in calls.items():
        got = np.asarray(call(t_d, q_d))
        assert np.array_equal(got, ref), f"{name} mismatch\n{got[:2]}\n{ref[:2]}"
    print("all variants bit-identical", file=sys.stderr)

    def make_runner(call):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(t, q, iters):
            def body(_, carry):
                t, acc = carry
                stats = call(t, q)
                acc = acc + jnp.sum(stats)
                t = t.at[0, 0].set((acc & 3).astype(jnp.uint8) + jnp.uint8(65))
                return (t, acc)

            _, acc = lax.fori_loop(0, iters, body, (t, jnp.int32(0)))
            return acc

        return run_iters

    runners = {name: make_runner(c) for name, c in calls.items()}

    LO, HI = 4, 24

    def run_batch(runner, iters):
        start = time.perf_counter()
        cs = int(np.asarray(runner(t_d, q_d, iters)))
        assert cs != 0
        return time.perf_counter() - start

    for name, r in runners.items():
        print(f"warm {name}", file=sys.stderr)
        run_batch(r, LO)
        run_batch(r, HI)

    lo_t = {n: [] for n in runners}
    hi_t = {n: [] for n in runners}
    ROUNDS = 9
    for rd in range(ROUNDS):
        for name, r in runners.items():
            lo_t[name].append(run_batch(r, LO))
            hi_t[name].append(run_batch(r, HI))
        print(f"round {rd} done", file=sys.stderr)

    for name in runners:
        tl, th = min(lo_t[name]), min(hi_t[name])
        rate = B * L * (HI - LO) / (th - tl) / 1e9 if th > tl else float("nan")
        print(f"{name:12s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")




# ---------------------------------------------------------------------------
# v4: SWAR word kernel -- inputs bitcast to i32 [B, L/4] OUTSIDE the kernel;
# every elementwise op covers 4 columns per lane and no u8->i32 widening
# relayouts happen at all.  Per-byte indicators are built with the
# nonzero-byte-high-bit trick, counted per word by a 0x01010101 multiply,
# and reduced with v1's 16-bit field packing (4 sums).
# ---------------------------------------------------------------------------

import numpy as _np
from jax import lax as _lax

_HI_I = int(_np.int32(_np.uint32(0x80808080)))
_GAPW_I = 0x2D2D2D2D


def _lsr(x, k):
    return _lax.shift_right_logical(x, jnp.int32(k))


def _nz_hi(x):
    """High bit set in every nonzero byte of x (int32 SWAR)."""
    y = (x & jnp.int32(0x7F7F7F7F)) + jnp.int32(0x7F7F7F7F)
    return (y | x) & jnp.int32(_HI_I)


def _cnt(hi_mask):
    """Per-word count (0..4) of set high bits in an 0x80-mask."""
    ones = _lsr(hi_mask, 7)
    return _lsr(ones * jnp.int32(0x01010101), 24)


def _kernel_v4(t_ref, q_ref, out_ref):
    j = pl.program_id(1)
    tw = t_ref[:]
    qw = q_ref[:]
    _HI = jnp.int32(_HI_I)
    _GAPW = jnp.int32(_GAPW_I)
    eq_hi = _HI & ~_nz_hi(tw ^ qw)
    ti_hi = _HI & ~_nz_hi(tw ^ _GAPW)
    qi_hi = _HI & ~_nz_hi(qw ^ _GAPW)
    ne = _HI & ~eq_hi
    i_hi = ti_hi & ne
    d_hi = qi_hi & ~ti_hi & ne
    x_hi = ne & ~ti_hi & ~qi_hi
    gg_hi = ti_hi & qi_hi

    # true 2-bit category byte (EQ=0, X=1, I=2, D=3) for run boundaries:
    # (eq,ti,qi) triples would distinguish gap/gap from base-equal, which
    # ext mode does not
    catw = _lsr(x_hi, 7) | _lsr(i_hi, 6) | (_lsr(d_hi, 6) | _lsr(d_hi, 7))
    carried = _lsr(pltpu.roll(catw, 1, axis=1), 24) & jnp.int32(0xFF)
    prevw = (catw << 8) | carried
    diff = catw ^ prevw
    # force a run start at byte0 of word0 (column 0 of the tile row)
    first_word = (
        jax.lax.broadcasted_iota(jnp.int32, tw.shape, 1) == 0
    )
    diff = diff | jnp.where(first_word, jnp.int32(0x80), jnp.int32(0))
    # diff bytes only use bits 0-2 (plus the forced bit7)
    rs_hi = _nz_hi(diff)

    f0 = _cnt(eq_hi) + (_cnt(x_hi) << 16)
    f1 = _cnt(i_hi) + (_cnt(d_hi) << 16)
    f2 = _cnt(i_hi & rs_hi) + (_cnt(d_hi & rs_hi) << 16)
    f3 = _cnt(gg_hi) + (_cnt(rs_hi) << 16)
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


def make_call_v4(B, L, tile_b=8, tile_lw=8192):
    LW = L // 4
    grid = (B // tile_b, LW // tile_lw)
    spec = pl.BlockSpec(
        (tile_b, tile_lw), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    ospec = pl.BlockSpec(
        (tile_b, N_STATS), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )

    @jax.jit
    def call(t, q):
        tw = jax.lax.bitcast_convert_type(
            t.reshape(B, LW, 4), jnp.int32
        )
        qw = jax.lax.bitcast_convert_type(
            q.reshape(B, LW, 4), jnp.int32
        )
        return pl.pallas_call(
            _kernel_v4,
            grid=grid,
            in_specs=[spec, spec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B, N_STATS), jnp.int32),
        )(tw, qw)

    return call


if __name__ == "__main__":
    main()
