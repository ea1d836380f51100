"""On-chip gate + A/B: DEFERRED-COUNT nibble classify kernel (v2) vs the
production per-step multiply-count form (classify_stat_pallas_nibbles).

The nibble kernel is VPU-op-bound (~565 Gcol/s standalone); of its ~70
vreg-ops per word, ~31 are per-step counting: seven 3-op multiply-counts
(cnt), 16-bit pair packing, and four row reductions EVERY grid step.  v2
defers all of it: the seven per-column indicator masks accumulate in
low-bit nibble form into a (7, TB, TLW) VMEM scratch (each 4-bit field
holds <= 15, so up to 15 grid steps per flush), and one flush per 15
steps does the split-nibble multiply-count + seven int32 row reductions.
Per step that replaces ~31 ops with 7 accumulator adds (+ ~4 amortized),
and the low-bit mask forms shave a few more (eq = LO ^ nz instead of
HI & ~nz).

Gate bit-for-bit on silicon FIRST (CLAUDE.md: a multiply-free ladder
once passed interpret mode and corrupted on chip), then same-process
alternating marginal rates at the production shape.
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

from wgatools_tpu.ops.classify import (  # noqa: E402
    N_STATS,
    _classify_codes,
    _finish_stats,
    classify_stat_jnp,
    classify_stat_pallas_nibbles,
    pack_nibble_words,
)

_M7_4 = 0x77777777
_LO4 = 0x11111111
_LO8 = 0x01010101
_NIBMASK = 0x0F0F0F0F
FLUSH = 15  # 4-bit accumulator fields saturate at 15 adds


def _kernel_nibbles_defer(
    t_ref, q_ref, out_ref, edge_ref, acc_ref, *, caller=False, ns=1
):
    """Deferred-count 4-bit SWAR body: indicators in LOW nibble bits,
    accumulated across up to FLUSH grid steps in VMEM scratch; counting
    (split-nibble 0x01010101 multiplies + int32 row reductions) runs
    only on flush steps.  Same outputs as classify._kernel_nibbles."""
    j = pl.program_id(1)
    tw = t_ref[:]
    qw = q_ref[:]
    M7 = jnp.int32(_M7_4)
    LO = jnp.int32(_LO4)

    def lsr(x, k):
        return jax.lax.shift_right_logical(x, jnp.int32(k))

    def nz_lo(x):
        y = (x & M7) + M7
        return lsr(y | x, 3) & LO

    ne_lo = nz_lo(tw ^ qw)
    tnz = nz_lo(tw)
    qnz = nz_lo(qw)
    eq_lo = LO ^ ne_lo
    ti_lo = LO ^ tnz
    qi_lo = LO ^ qnz
    gg_lo = ti_lo & qi_lo
    if caller:
        i_lo = ti_lo ^ gg_lo
        d_lo = qi_lo ^ gg_lo
        is_eq_lo = eq_lo & (ti_lo ^ LO)
        catw = (
            is_eq_lo | (i_lo << 1) | (d_lo << 2) | (gg_lo << 3)
        )
    else:
        i_lo = ti_lo & ne_lo
        d_lo = qi_lo & ne_lo
        is_eq_lo = eq_lo
        catw = is_eq_lo | (i_lo << 1) | (d_lo << 2)
    carried = lsr(pltpu.roll(catw, 1, axis=1), 28) & jnp.int32(0xF)
    prevw = (catw << 4) | carried
    rs_lo = nz_lo(catw ^ prevw)
    masks = (
        is_eq_lo,
        gg_lo,
        i_lo,
        d_lo,
        i_lo & rs_lo,
        d_lo & rs_lo,
        rs_lo,
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for k, m in enumerate(masks):
        acc_ref[k] += m

    @pl.when((j % FLUSH == FLUSH - 1) | (j == ns - 1))
    def _():
        i32 = jnp.int32
        nib = jnp.int32(_NIBMASK)
        lo8 = jnp.int32(_LO8)
        sums = []
        for k in range(7):
            a = acc_ref[k]
            c = lsr((a & nib) * lo8, 24) + lsr((lsr(a, 4) & nib) * lo8, 24)
            sums.append(jnp.sum(c, axis=1, dtype=i32))
        s_eq, s_gg, s_i, s_d, s_ie, s_de, s_rs = sums
        TLW = tw.shape[1]
        steps = (j % FLUSH) + 1
        cols = steps * jnp.int32(8 * TLW)
        s_x = cols - s_eq - s_i - s_d
        if caller:
            s_x = s_x - s_gg
        stats = jnp.stack(
            [s_eq, s_x, s_i, s_d, s_ie, s_de, s_gg, s_rs], axis=1
        )
        out_ref[:] += stats
        acc_ref[:] = jnp.zeros_like(acc_ref)

    first_c = catw[:, 0:1] & jnp.int32(0xF)
    LW = tw.shape[1]
    last_c = lsr(catw[:, LW - 1 : LW], 28) & jnp.int32(0xF)

    # low-bit one-hot codes: eq=1, i=2, d=4, gg=8, x=0 (same as v1)
    from wgatools_tpu.ops.classify import D, EQ, I, W, X

    def to_std(c):
        return jnp.where(
            c == 1,
            jnp.int32(EQ),
            jnp.where(
                c == 2,
                jnp.int32(I),
                jnp.where(
                    c == 4,
                    jnp.int32(D),
                    jnp.where(c == 8, jnp.int32(W), jnp.int32(X)),
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
def classify_stat_nibbles_defer(
    tw, qw, lengths, tile_b=64, tile_lw=4096, interpret=False, caller=False
):
    """v2 wrapper: identical contract to classify_stat_pallas_nibbles."""
    B, LW = tw.shape
    tile_b = min(tile_b, B)
    tile_lw = min(tile_lw, LW)
    if LW % tile_lw:
        LW2 = ((LW + tile_lw - 1) // tile_lw) * tile_lw
        tw = jnp.pad(tw, ((0, 0), (0, LW2 - LW)))
        qw = jnp.pad(qw, ((0, 0), (0, LW2 - LW)))
        LW = LW2
    if B % tile_b:
        B2 = ((B + tile_b - 1) // tile_b) * tile_b
        tw = jnp.pad(tw, ((0, B2 - B), (0, 0)))
        qw = jnp.pad(qw, ((0, B2 - B), (0, 0)))
        lengths = jnp.pad(lengths, (0, B2 - B))
        pad_rows = B2 - B
        B = B2
    else:
        pad_rows = 0
    L = 8 * LW
    nb = pl.cdiv(B, tile_b)
    nl = pl.cdiv(LW, tile_lw)

    out, edges = pl.pallas_call(
        functools.partial(_kernel_nibbles_defer, caller=caller, ns=nl),
        grid=(nb, nl),
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
        scratch_shapes=[pltpu.VMEM((7, tile_b, tile_lw), jnp.int32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * B * LW, bytes_accessed=8 * B * LW + 4 * B * N_STATS,
            transcendentals=0,
        ),
    )(tw, qw)

    last_idx = jnp.maximum(lengths - 1, 0)
    widx = last_idx // 8
    shift = ((last_idx % 8) * 4).astype(jnp.int32)
    wv_t = jnp.take_along_axis(tw, widx[:, None], axis=1)[:, 0]
    wv_q = jnp.take_along_axis(qw, widx[:, None], axis=1)[:, 0]
    ct = jax.lax.shift_right_logical(wv_t, shift) & jnp.int32(0xF)
    cq = jax.lax.shift_right_logical(wv_q, shift) & jnp.int32(0xF)
    last_real_cat = _classify_codes(ct, cq, caller)
    return _finish_stats(
        out, edges, nl, L, lengths, last_real_cat, caller, pad_rows
    )


def _cases(rng, B=16, L=1 << 17):
    """Parity cases: ragged lengths, runs, gap-gap columns, both modes."""
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)
    t = alphabet[rng.integers(0, 5, size=(B, L))]
    q = alphabet[rng.integers(0, 5, size=(B, L))]
    # realistic-ish: long '='-dominated rows in half the batch
    t[8:] = q[8:]
    t[8:, ::97] = alphabet[0]
    lengths = rng.integers(1, L + 1, size=B).astype(np.int32)
    lengths[0] = L
    for b in range(B):
        t[b, lengths[b]:] = ord("-")
        q[b, lengths[b]:] = ord("-")
    return t, q, lengths


def check_parity(interpret):
    rng = np.random.default_rng(11)
    # interpret mode runs each grid step in Python: keep the CPU case
    # small but still crossing a 15-step flush boundary (tile_lw=64 ->
    # 32 steps) AND exercising the flush-at-ns-1 path (tile_lw=512 ->
    # 4 steps, never hits j%15==14)
    if interpret:
        t, q, lengths = _cases(rng, B=8, L=1 << 14)
        tiles = (64, 512)
    else:
        t, q, lengths = _cases(rng)
        tiles = (512, 4096)
    tw, qw = pack_nibble_words(t, q)
    tw_d, qw_d = jnp.asarray(tw), jnp.asarray(qw)
    l_d = jnp.asarray(lengths)
    for caller in (False, True):
        want = np.asarray(
            classify_stat_jnp(jnp.asarray(t), jnp.asarray(q), l_d, caller)
        )
        for tile_lw in tiles:
            got = np.asarray(
                classify_stat_nibbles_defer(
                    tw_d, qw_d, l_d, tile_b=8, tile_lw=tile_lw,
                    interpret=interpret, caller=caller,
                )
            )
            assert np.array_equal(got, want), (
                f"caller={caller} tile_lw={tile_lw}\n"
                f"got:\n{got[:4]}\nwant:\n{want[:4]}"
            )
    print(
        f"defer-count parity (interpret={interpret}): OK", file=sys.stderr
    )


def main():
    on_tpu = jax.default_backend() == "tpu"
    check_parity(interpret=not on_tpu)
    if not on_tpu:
        print("CPU parity only (no chip)", file=sys.stderr)
        return
    check_parity(interpret=False)  # ON-CHIP gate

    B, L = 128, 1 << 20
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)
    t0 = alphabet[rng.integers(0, 5, size=(B, L))]
    q0 = alphabet[rng.integers(0, 5, size=(B, L))]
    lens_d = jax.device_put(jnp.full(B, L, dtype=jnp.int32))
    tn, qn = pack_nibble_words(t0, q0)
    tn_d = jax.device_put(jnp.asarray(tn))
    qn_d = jax.device_put(jnp.asarray(qn))

    variants = {
        "v1": lambda t, q: classify_stat_pallas_nibbles(
            t, q, lens_d, tile_b=64, tile_lw=4096
        ),
        # (7, TB, TLW) scratch + temporaries must fit the 16 MB scoped
        # VMEM limit: (64, 4096) OOMs at 17.1 MB, so halve one axis
        "v2": lambda t, q: classify_stat_nibbles_defer(
            t, q, lens_d, tile_b=64, tile_lw=2048
        ),
        "v2w": lambda t, q: classify_stat_nibbles_defer(
            t, q, lens_d, tile_b=32, tile_lw=4096
        ),
    }

    def make_runner(call):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(t, q, iters):
            def body(_, carry):
                t, acc = carry
                stats = call(t, q)
                acc = acc + jnp.sum(stats)
                t = t.at[0, 0].set(jnp.int32(0x11111111) + (acc & 3))
                return (t, acc)

            _, acc = lax.fori_loop(0, iters, body, (t, jnp.int32(0)))
            return acc

        return run_iters

    runners = {n: make_runner(c) for n, c in variants.items()}
    LO_I, HI_I = 4, 44

    def run_batch(n, r, iters):
        start = time.perf_counter()
        cs = int(np.asarray(r(tn_d, qn_d, iters)))
        assert cs != 0
        return time.perf_counter() - start

    for n, r in runners.items():
        print(f"warm {n}", file=sys.stderr)
        run_batch(n, r, LO_I)
        run_batch(n, r, HI_I)

    lo_t = {n: [] for n in runners}
    hi_t = {n: [] for n in runners}
    for rd in range(7):
        for n, r in runners.items():
            lo_t[n].append(run_batch(n, r, LO_I))
            hi_t[n].append(run_batch(n, r, HI_I))
        print(f"round {rd} done", file=sys.stderr)

    for n in runners:
        tl, th = min(lo_t[n]), min(hi_t[n])
        rate = (
            B * L * (HI_I - LO_I) / (th - tl) / 1e9
            if th > tl
            else float("nan")
        )
        print(f"{n:4s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
