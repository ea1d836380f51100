"""Same-process A/B: count-extraction strategies in the words kernel.

The kernel does 7 cnt() ops per word tile, each a 32-bit multiply
(cost unknown on the v5e VPU -- int32 muls are often multi-cycle).
Variants (ext mode, bit-identical):
  prod   v3 production kernel (7 separate 0x01010101 multiplies)
  pair   masks paired two-per-multiply: x = m1>>7 | m2>>3 gives per-byte
         b1 + 16*b2; the multiply's top byte is c1 + 16*c2 (c1 <= 4, no
         carry), separated after -- 4 multiplies instead of 7
  ladder paired masks, multiply replaced by a 2-step byte-sum ladder
         (x + x>>8, + >>16) -- zero multiplies
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


def _kernel_v4(t_ref, q_ref, out_ref, edge_ref, *, how):
    j = pl.program_id(1)
    tw = t_ref[:]
    qw = q_ref[:]
    HI = jnp.int32(_HI32)
    i32 = jnp.int32

    def lsr(x, k):
        return jax.lax.shift_right_logical(x, jnp.int32(k))

    def nz_hi(x):
        y = (x & jnp.int32(0x7F7F7F7F)) + jnp.int32(0x7F7F7F7F)
        return (y | x) & HI

    eq_hi = HI & ~nz_hi(tw ^ qw)
    ti_hi = HI & ~nz_hi(tw ^ jnp.int32(_GAPW32))
    qi_hi = HI & ~nz_hi(qw ^ jnp.int32(_GAPW32))
    gg_hi = ti_hi & qi_hi
    ne = HI & ~eq_hi
    i_hi = ti_hi & ne
    d_hi = qi_hi & ne
    catw = lsr(eq_hi, 7) | lsr(i_hi, 6) | lsr(d_hi, 5)
    carried = lsr(pltpu.roll(catw, 1, axis=1), 24) & jnp.int32(0xFF)
    diff = catw ^ ((catw << 8) | carried)
    rs_hi = nz_hi(diff)

    def cnt_pair(m1, m2):
        # per-byte value b1 + 16*b2; top byte of the multiply = c1 + 16*c2
        x = lsr(m1, 7) | lsr(m2, 3)
        if how == "ladder":
            s4 = x + lsr(x, 8)
            s = lsr(s4 + lsr(s4, 16), 24)
        else:
            s = lsr(x * jnp.int32(0x01010101), 24)
        return (s & jnp.int32(0xF)) + (lsr(s, 4) << 16)

    f0 = cnt_pair(eq_hi, gg_hi)
    f1 = cnt_pair(i_hi, d_hi)
    f2 = cnt_pair(i_hi & rs_hi, d_hi & rs_hi)
    f3 = cnt_pair(rs_hi, rs_hi)  # second field unused
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
    s_x = jnp.int32(4 * LW) - s_eq - s_i - s_d
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
    first_c = catw[:, 0:1] & jnp.int32(0xFF)
    last_c = lsr(catw[:, LW - 1 : LW], 24)

    def to_std(c):
        return jnp.where(
            c == 1,
            jnp.int32(0),
            jnp.where(
                c == 2,
                jnp.int32(2),
                jnp.where(c == 4, jnp.int32(3), jnp.int32(1)),
            ),
        )

    pad_lanes = jnp.zeros((tw.shape[0], 126), jnp.int32)
    edge_ref[:] = jnp.concatenate(
        [to_std(first_c), to_std(last_c), pad_lanes], axis=1
    )


@functools.partial(
    jax.jit, static_argnames=("tile_b", "tile_lw", "interpret", "how")
)
def classify_v4(tw, qw, lengths, tile_b=64, tile_lw=8192, interpret=False,
                how="pair"):
    B, LW = tw.shape
    tile_b = min(tile_b, B)
    tile_lw = min(tile_lw, LW)
    assert LW % tile_lw == 0 and B % tile_b == 0
    nl = LW // tile_lw
    out, edges = pl.pallas_call(
        functools.partial(_kernel_v4, how=how),
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(tw, qw)
    L = 4 * LW
    last_idx = jnp.maximum(lengths - 1, 0)
    widx = last_idx // 4
    shift = ((last_idx % 4) * 8).astype(jnp.int32)
    wv_t = jnp.take_along_axis(tw, widx[:, None], axis=1)[:, 0]
    wv_q = jnp.take_along_axis(qw, widx[:, None], axis=1)[:, 0]
    bt = jax.lax.shift_right_logical(wv_t, shift) & jnp.int32(0xFF)
    bq = jax.lax.shift_right_logical(wv_q, shift) & jnp.int32(0xFF)
    last_real_cat = _classify(bt, bq, False).astype(jnp.int32)
    return _finish_stats(out, edges, nl, L, lengths, last_real_cat, False, 0)


def main():
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT-", np.uint8)

    Bp, Lp = 8, 1 << 15
    tp = alpha[rng.integers(0, 5, size=(Bp, Lp))]
    qp = alpha[rng.integers(0, 5, size=(Bp, Lp))]
    lens_p = np.full(Bp, Lp, np.int32)
    lens_p[1] = Lp // 3
    tp[1, lens_p[1]:] = ord("-")
    qp[1, lens_p[1]:] = ord("-")
    want = np.asarray(
        classify_stat_jnp(jnp.asarray(tp), jnp.asarray(qp), jnp.asarray(lens_p))
    )
    for how in ("pair",):
        got = np.asarray(
            classify_v4(
                jnp.asarray(tp.view("<i4")), jnp.asarray(qp.view("<i4")),
                jnp.asarray(lens_p), tile_b=8, tile_lw=2048,
                interpret=interpret, how=how,
            )
        )
        assert np.array_equal(got, want), f"{how}\n{got[:3]}\n{want[:3]}"
    print("v4 parity OK", file=sys.stderr)
    if interpret:
        print("CPU: correctness only")
        return

    B, L = 128, 1 << 20
    t0 = alpha[rng.integers(0, 5, size=(B, L))]
    q0 = alpha[rng.integers(0, 5, size=(B, L))]
    tw = jax.device_put(jnp.asarray(t0.view("<i4")))
    qw = jax.device_put(jnp.asarray(q0.view("<i4")))
    lens_d = jax.device_put(jnp.full(B, L, jnp.int32))

    calls = {
        "prod": lambda a, b: classify_stat_pallas_words(
            a, b, lens_d, tile_b=64
        ),
        "pair": lambda a, b: classify_v4(a, b, lens_d, how="pair"),
            }

    def make_runner(call):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(tw, iters):
            def body(_, carry):
                tw, acc = carry
                stats = call(tw, qw)
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
        cs = int(np.asarray(r(tw, iters)))
        assert cs != 0
        return time.perf_counter() - start

    for name, r in runners.items():
        print(f"warm {name}", file=sys.stderr, flush=True)
        run_batch(r, LO)
        run_batch(r, HI)
    lo_t = {n: [] for n in runners}
    hi_t = {n: [] for n in runners}
    for rd in range(6):
        for name, r in runners.items():
            lo_t[name].append(run_batch(r, LO))
            hi_t[name].append(run_batch(r, HI))
        print(f"round {rd} done", file=sys.stderr, flush=True)
    for name in runners:
        tl, th = min(lo_t[name]), min(hi_t[name])
        rate = B * L * (HI - LO) / (th - tl) / 1e9 if th > tl else float("nan")
        print(f"{name:7s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
