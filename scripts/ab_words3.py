"""Same-process A/B: production words kernel vs the round-3 VPU-trimmed
variant (v3).

The words kernel is VPU-bound (~80 elementwise ops per 4-column word;
DMA per step is ~2x faster than the op stream).  v3 trims ops:
  * X counts derive from the column total per tile row
    (x = 4*TLW - eq - i - d [- gg in caller mode]) -- drops x_hi and its
    cnt() multiply;
  * run-boundary codes use a one-hot-ish c = eq|i<<1|d<<2 (gg<<3) code
    built with 3 shifts instead of the 4-shift standard-code build; the
    tile-edge side output translates its two lanes back to the standard
    EQ/X/I/D/W codes so the exact _finish_stats corrections still apply;
  * ext-mode d_hi drops a redundant ~ti (q-gap & not-equal already
    implies t is not a gap).

Outputs must stay bit-identical to classify_stat_jnp.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wgatools_tpu.ops.classify import (
    N_STATS,
    _classify,
    _finish_stats,
    _GAPW32,
    _HI32,
    classify_stat_jnp,
    classify_stat_pallas_words,
)


def _kernel_words_v3(t_ref, q_ref, out_ref, edge_ref, *, caller=False):
    j = pl.program_id(1)
    tw = t_ref[:]
    qw = q_ref[:]
    HI = jnp.int32(_HI32)

    def lsr(x, k):
        return jax.lax.shift_right_logical(x, jnp.int32(k))

    def nz_hi(x):
        y = (x & jnp.int32(0x7F7F7F7F)) + jnp.int32(0x7F7F7F7F)
        return (y | x) & HI

    eq_hi = HI & ~nz_hi(tw ^ qw)
    ti_hi = HI & ~nz_hi(tw ^ jnp.int32(_GAPW32))
    qi_hi = HI & ~nz_hi(qw ^ jnp.int32(_GAPW32))
    gg_hi = ti_hi & qi_hi
    if caller:
        i_hi = ti_hi & ~qi_hi
        d_hi = qi_hi & ~ti_hi
        is_eq_hi = eq_hi & ~ti_hi
        # boundary code: eq|i<<1|d<<2|gg<<3 (x -> 0); every category maps
        # to a distinct per-byte value, which is all run detection needs
        catw = (
            lsr(is_eq_hi, 7)
            | lsr(i_hi, 6)
            | lsr(d_hi, 5)
            | lsr(gg_hi, 4)
        )
    else:
        ne = HI & ~eq_hi
        i_hi = ti_hi & ne
        # q-gap & not-equal implies t is not a gap (gap/gap is equal)
        d_hi = qi_hi & ne
        is_eq_hi = eq_hi
        catw = lsr(is_eq_hi, 7) | lsr(i_hi, 6) | lsr(d_hi, 5)
    carried = lsr(pltpu.roll(catw, 1, axis=1), 24) & jnp.int32(0xFF)
    prevw = (catw << 8) | carried
    diff = catw ^ prevw
    first_word = jax.lax.broadcasted_iota(jnp.int32, tw.shape, 1) == 0
    diff = diff | jnp.where(first_word, jnp.int32(0x80), jnp.int32(0))
    rs_hi = nz_hi(diff)

    def cnt(m):
        return lsr(lsr(m, 7) * jnp.int32(0x01010101), 24)

    f0 = cnt(is_eq_hi) + (cnt(gg_hi) << 16)
    f1 = cnt(i_hi) + (cnt(d_hi) << 16)
    f2 = cnt(i_hi & rs_hi) + (cnt(d_hi & rs_hi) << 16)
    f3 = cnt(rs_hi)
    i32 = jnp.int32
    s0 = jnp.sum(f0, axis=1, dtype=i32)
    s1 = jnp.sum(f1, axis=1, dtype=i32)
    s2 = jnp.sum(f2, axis=1, dtype=i32)
    s3 = jnp.sum(f3, axis=1, dtype=i32)
    mask = jnp.int32(0xFFFF)
    s_eq = s0 & mask
    s_gg = (s0 >> 16) & mask
    s_i = s1 & mask
    s_d = (s1 >> 16) & mask
    LW = tw.shape[1]
    # X from the partition: ext has eq+i+d+x = 4*LW (eq includes gap/gap);
    # caller has eq+i+d+x+gg = 4*LW
    s_x = jnp.int32(4 * LW) - s_eq - s_i - s_d
    if caller:
        s_x = s_x - s_gg
    stats = jnp.stack(
        [
            s_eq,
            s_x,
            s_i,
            s_d,
            (s2 & mask),
            (s2 >> 16) & mask,
            s_gg,
            s3 & mask,
        ],
        axis=1,
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += stats
    # edge slot: translate the two boundary lanes back to the standard
    # EQ=0/X=1/I=2/D=3/W=4 codes _finish_stats expects.  c-code values:
    # eq=1, i=2, d=4, gg(caller)=8, x=0
    first_c = catw[:, 0:1] & jnp.int32(0xFF)
    last_c = lsr(catw[:, LW - 1 : LW], 24)

    def to_std(c):
        return jnp.where(
            c == 1,
            jnp.int32(0),
            jnp.where(
                c == 2,
                jnp.int32(2),
                jnp.where(
                    c == 4,
                    jnp.int32(3),
                    jnp.where(c == 8, jnp.int32(4), jnp.int32(1)),
                ),
            ),
        )

    pad_lanes = jnp.zeros((tw.shape[0], 126), jnp.int32)
    edge_ref[:] = jnp.concatenate(
        [to_std(first_c), to_std(last_c), pad_lanes], axis=1
    )


@functools.partial(
    jax.jit, static_argnames=("tile_b", "tile_lw", "interpret", "caller")
)
def classify_words_v3(
    tw, qw, lengths, tile_b=32, tile_lw=8192, interpret=False, caller=False
):
    B, LW = tw.shape
    tile_b = min(tile_b, B)
    tile_lw = min(tile_lw, LW)
    assert tile_lw * 4 < (1 << 16)
    gapw = jnp.int32(_GAPW32)
    assert LW % tile_lw == 0 and B % tile_b == 0  # A/B shapes are exact
    nl = LW // tile_lw
    out, edges = pl.pallas_call(
        functools.partial(_kernel_words_v3, caller=caller),
        grid=(B // tile_b, nl),
        in_specs=[
            pl.BlockSpec(
                (tile_b, tile_lw), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_b, tile_lw), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_b, N_STATS), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_b, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N_STATS), jnp.int32),
            jax.ShapeDtypeStruct((B, 128 * nl), jnp.int32),
        ],
        interpret=interpret,
    )(tw, qw)
    L = 4 * LW
    last_idx = jnp.maximum(lengths - 1, 0)
    widx = last_idx // 4
    shift = ((last_idx % 4) * 8).astype(jnp.int32)
    wv_t = jnp.take_along_axis(tw, widx[:, None], axis=1)[:, 0]
    wv_q = jnp.take_along_axis(qw, widx[:, None], axis=1)[:, 0]
    bt = jax.lax.shift_right_logical(wv_t, shift) & jnp.int32(0xFF)
    bq = jax.lax.shift_right_logical(wv_q, shift) & jnp.int32(0xFF)
    last_real_cat = _classify(bt, bq, caller).astype(jnp.int32)
    return _finish_stats(out, edges, nl, L, lengths, last_real_cat, caller, 0)


def main():
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    B, L = (32, 1 << 22) if on_tpu else (4, 1 << 17)
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)

    # parity at SMALL size (the remote tunnel moves bytes at ~1 MB/s;
    # full-size parity arrays would dominate the whole run) -- the
    # full-size numerics are identical modulo tile count, and bench.py
    # gates the production kernel at full size anyway
    Bp, Lp = 8, 1 << 16
    tp = alphabet[rng.integers(0, 5, size=(Bp, Lp))]
    qp = alphabet[rng.integers(0, 5, size=(Bp, Lp))]
    for frac in (None, 0.3):
        lens = np.full(Bp, Lp, np.int32)
        t2, q2 = tp.copy(), qp.copy()
        if frac:
            lens = (Lp * (frac + rng.random(Bp) * (1 - frac))).astype(
                np.int32
            )
            for b in range(Bp):
                t2[b, lens[b]:] = ord("-")
                q2[b, lens[b]:] = ord("-")
        twd = jax.device_put(jnp.asarray(t2.view("<i4")))
        qwd = jax.device_put(jnp.asarray(q2.view("<i4")))
        lens_d = jax.device_put(jnp.asarray(lens))
        for caller in (False, True):
            want = np.asarray(
                classify_stat_jnp(
                    jnp.asarray(t2), jnp.asarray(q2), lens_d, caller=caller
                )
            )
            got = np.asarray(
                classify_words_v3(
                    twd, qwd, lens_d, tile_lw=2048,
                    interpret=interpret, caller=caller,
                )
            )
            assert np.array_equal(got, want), (
                f"v3 mismatch caller={caller} frac={frac}\n"
                f"{got[:3]}\n{want[:3]}"
            )
    print("v3 parity OK (both modes, ragged + full)", file=sys.stderr)
    if interpret:
        print("CPU interpret mode: correctness only")
        return

    t0 = alphabet[rng.integers(0, 5, size=(B, L))]
    q0 = alphabet[rng.integers(0, 5, size=(B, L))]
    tw_d = jax.device_put(jnp.asarray(t0.view("<i4")))
    qw_d = jax.device_put(jnp.asarray(q0.view("<i4")))
    lens_d = jax.device_put(jnp.full(B, L, jnp.int32))
    calls = {
        "prod": lambda a, b: classify_stat_pallas_words(a, b, lens_d),
        "v3": lambda a, b: classify_words_v3(a, b, lens_d),
    }

    def make_runner(call):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(tw, iters):
            def body(_, carry):
                tw, acc = carry
                stats = call(tw, qw_d)
                acc = acc + jnp.sum(stats)
                tw = tw.at[0, 0].set(jnp.int32(0x41414141) + (acc & 3))
                return (tw, acc)

            _, acc = lax.fori_loop(0, iters, body, (tw, jnp.int32(0)))
            return acc

        return run_iters

    runners = {n: make_runner(c) for n, c in calls.items()}
    LO, HI = 4, 40

    def run_batch(r, iters):
        start = time.perf_counter()
        cs = int(np.asarray(r(tw_d, iters)))
        assert cs != 0
        return time.perf_counter() - start

    for name, r in runners.items():
        print(f"warm {name}", file=sys.stderr, flush=True)
        run_batch(r, LO)
        run_batch(r, HI)
    lo_t = {n: [] for n in runners}
    hi_t = {n: [] for n in runners}
    for rd in range(7):
        for name, r in runners.items():
            lo_t[name].append(run_batch(r, LO))
            hi_t[name].append(run_batch(r, HI))
        print(f"round {rd} done", file=sys.stderr, flush=True)
    for name in runners:
        tl, th = min(lo_t[name]), min(hi_t[name])
        rate = B * L * (HI - LO) / (th - tl) / 1e9 if th > tl else float("nan")
        print(f"{name:6s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
