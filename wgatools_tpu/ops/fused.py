"""Fused classify + liftover: one Pallas kernel, one grid pass.

Round-2 profiling showed the combined CIGAR engine loop (the hot path of
every conversion workload, reference src/parser/cigar.rs:344-432 +
251-295) serializing its two device stages: the word-packed SWAR
column-classify kernel (HBM/VPU-bound, ~64 MB of column bytes per batch)
followed by the liftover op-scan kernel (MXU-bound, ~2.6 MB of op table)
-- back-to-back they ran at ~48% of the self-computed streaming roofline
(VERDICT round 2, "what's weak" #2).

The two stages are data-independent within a batch (columns in, op
tables in; production pipelines overlap batch i's op scan with batch
i+1's columns), so one kernel can process a column tile AND an op tile
per grid step.  The op-scan's VPU prep + MXU matmuls hide under the
column stream's DMA time, and the per-grid-step fixed cost (which
dominated the tiny op tiles: scripts/ab_liftover.py measured the
two-level scan with 4x fewer MACs no faster than the full triangle) is
paid once for both stages instead of twice.

Numerics are bit-identical to running `classify_stat_pallas_words` and
`liftover_scan_pallas` separately (differential-tested).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .classify import (
    N_STATS,
    _cat_last_real,
    _classify,
    _classify_codes,
    _finish_stats,
    _GGW32,
    _kernel_cat,
    _kernel_nibbles,
    _kernel_words,
)
from .liftover import (
    OP_D,
    OP_I,
    OP_S,
    _hillis_scan_pair,
    _pair_prefix_mm,
)


def _advances_from_refs(ops, lens):
    """(adv_t, adv_q) int32 from either (ops u8, lens i32) tiles or ONE
    packed op-word tile (ops is int32: op byte in bits 24-31, len in the
    low 16 bits; lens is None).  The packed form saves a byte/op of DMA
    and the u8->i32 widening relayout."""
    i32 = jnp.int32
    if lens is None:
        o32 = jax.lax.shift_right_logical(ops, jnp.int32(24))
        lens = ops & jnp.int32(0xFFFF)
    else:
        o32 = ops.astype(i32)
    pad = o32 == 0
    is_i = o32 == OP_I
    is_s = o32 == OP_S
    is_d = o32 == OP_D
    adv_t = jnp.where(pad | is_i | is_s, 0, lens)
    adv_q = jnp.where(pad | is_d, 0, lens)
    return adv_t, adv_q


def _liftover_block(
    ops, lens, tri_x, toff_ref, qoff_ref, carry_ref, j, chunk=None,
    scan_mode="mm",
):
    """Liftover op-scan on one (TB, TLO) tile; shared by the fused kernel.

    scan_mode="mm": single-widen advance selection + ONE stacked
    (4*TB, TLO) x (TLO, TLO) bf16 limb matmul (full MXU rows), cross-tile
    carry in scratch -- the round-2 production formulation
    (ops/liftover.py:102-158).  chunk=c selects the two-level form: rows
    reshape to (TB*TLO/c, c), scan against a (c, c) triangle (TLO/c x
    fewer MACs), then chunk offsets recombine with unrolled adds.

    scan_mode="vpu": Hillis-Steele int32 ladder (_hillis_scan_pair) --
    round-3 default; tri_x is unused.
    """
    i32 = jnp.int32
    adv_t, adv_q = _advances_from_refs(ops, lens)
    TB, TLO = adv_t.shape

    if scan_mode == "vpu":

        @pl.when(j == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        carry = carry_ref[:]
        ex_t, ex_q = _hillis_scan_pair(adv_t, adv_q, carry)
        toff_ref[:] = ex_t
        qoff_ref[:] = ex_q
        carry_ref[:] = jnp.concatenate(
            [
                ex_t[:, TLO - 1 : TLO] + adv_t[:, TLO - 1 : TLO],
                ex_q[:, TLO - 1 : TLO] + adv_q[:, TLO - 1 : TLO],
            ],
            axis=1,
        )
        return

    ex_t, ex_q = _pair_prefix_mm(adv_t, adv_q, tri_x, chunk=chunk)

    @pl.when(j == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    carry = carry_ref[:]
    ex_t = ex_t + carry[:, 0:1]
    ex_q = ex_q + carry[:, 1:2]
    toff_ref[:] = ex_t
    qoff_ref[:] = ex_q
    carry_ref[:] = jnp.concatenate(
        [
            ex_t[:, TLO - 1 : TLO] + adv_t[:, TLO - 1 : TLO],
            ex_q[:, TLO - 1 : TLO] + adv_q[:, TLO - 1 : TLO],
        ],
        axis=1,
    )


def _fused_kernel(
    tw_ref,
    qw_ref,
    ops_ref,
    lens_ref,
    tri_ref,
    out_ref,
    edge_ref,
    toff_ref,
    qoff_ref,
    carry_ref,
    *,
    caller=False,
    chunk=None,
    scan_mode="mm",
):
    # classify stage: identical body to the words kernel (writes
    # out_ref/edge_ref, resets out_ref at j == 0)
    _kernel_words(tw_ref, qw_ref, out_ref, edge_ref, caller=caller)
    # liftover stage on this step's op tile
    j = pl.program_id(1)
    _liftover_block(
        ops_ref[:], lens_ref[:], tri_ref[:], toff_ref, qoff_ref,
        carry_ref, j, chunk=chunk, scan_mode=scan_mode,
    )


def _fused_kernel_packed16(
    tw_ref,
    qw_ref,
    opw_ref,
    *rest,
    caller=False,
    nibble=False,
    scan_mode="vpu",
):
    """16-bit packed-op variant: TWO ops per int32 (3-bit advance class +
    13-bit length per half, liftover.pack_ops_words16).  The scan runs
    over PAIR SUMS at half the lane width, then derives the even/odd
    offsets:

        te[l] = P[l]            to[l] = P[l] + adv_even[l]

    where P is the exclusive pair-sum prefix.  Offsets return as
    even/odd half-arrays (interleaving on SIMD lanes is a relayout;
    hosts zip them in O(1) numpy, and strided consumers index halves
    directly).

    scan_mode="vpu": int32 Hillis-Steele ladder (9 steps at TLOH=512) --
    pure VPU, which SERIALIZES behind the classify stage's VPU work.
    scan_mode="mm": 2-limb bf16 triangle matmul on the idle MXU (exact:
    pair sums < 2^14, limbs <= 255 are bf16-exact, within-tile partial
    sums < 2^24 are f32-exact); the VPU only decodes/selects/converts,
    so most of the scan hides under the classify's VPU time.  A tri_ref
    input (strictly-lower (TLOH, TLOH) bf16 triangle) precedes the
    output refs in that mode.

    nibble=True runs the classify stage on 4-bit dictionary-packed
    planes (classify._kernel_nibbles, 8 columns per lane -- half the
    column DMA, 1.88x the standalone classify rate on-chip,
    scripts/ab_nibble.py)."""
    if scan_mode == "mm":
        (tri_ref, out_ref, edge_ref, te_ref, to_ref, qe_ref, qo_ref,
         carry_ref) = rest
    else:
        (out_ref, edge_ref, te_ref, to_ref, qe_ref, qo_ref,
         carry_ref) = rest
        tri_ref = None
    body = _kernel_nibbles if nibble else _kernel_words
    body(tw_ref, qw_ref, out_ref, edge_ref, caller=caller)
    j = pl.program_id(1)
    i32 = jnp.int32
    w = opw_ref[:]

    def lsr(x, k):
        return jax.lax.shift_right_logical(x, jnp.int32(k))

    m13 = jnp.int32(0x1FFF)
    len0 = w & m13
    cls0 = lsr(w, 13) & jnp.int32(7)
    len1 = lsr(w, 16) & m13
    cls1 = lsr(w, 29)

    def advances(cls, ln):
        # ADV_BOTH=1, ADV_I=2, ADV_S=3, ADV_D=4 (liftover._ADV_CLASS)
        adv_t = jnp.where((cls == 1) | (cls == 4), ln, 0)
        adv_q = jnp.where((cls == 1) | (cls == 2) | (cls == 3), ln, 0)
        return adv_t, adv_q

    at0, aq0 = advances(cls0, len0)
    at1, aq1 = advances(cls1, len1)
    ct = at0 + at1
    cq = aq0 + aq1
    TB, TLOH = ct.shape

    @pl.when(j == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    carry = carry_ref[:]
    if scan_mode == "mm":
        # exclusive pair-sum prefixes via ONE stacked bf16 limb matmul
        # (both streams x both limbs, full MXU rows -- the round-2
        # stacking trick, ab_liftover.py)
        p_t, p_q = _pair_prefix_mm(ct, cq, tri_ref[:])
        p_t = p_t + carry[:, 0:1]
        p_q = p_q + carry[:, 1:2]
    else:
        p_t, p_q = _hillis_scan_pair(ct, cq, carry)
    te_ref[:] = p_t
    to_ref[:] = p_t + at0
    qe_ref[:] = p_q
    qo_ref[:] = p_q + aq0
    carry_ref[:] = jnp.concatenate(
        [
            p_t[:, TLOH - 1 : TLOH] + ct[:, TLOH - 1 : TLOH],
            p_q[:, TLOH - 1 : TLOH] + cq[:, TLOH - 1 : TLOH],
        ],
        axis=1,
    )


def _fused_kernel_adv16(
    *refs,
    caller=False,
    nibble=False,
    catmode=False,
    scan_mode="vpu",
    chunk=None,
    emit_odd=True,
    raw_sums=False,
):
    """Advance-packed variant (liftover.pack_ops_adv16): per op pair and
    per direction one int32 word (adv_even << 14) | pair_sum.  The
    on-chip A/B (scripts/ab_scan_mm.py) showed the packed16 kernel's
    op-scan cost was the per-word class decode + advance SELECTS (~20
    vreg-ops/word), not the ladder -- here the host packer did all of
    that, and the kernel decode is two shift/mask ops per direction:

        ct = wt & 0x3FFF      at0 = wt >> 14
        te = P                to = P + at0      (P = exclusive scan of ct)

    scan_mode as in _fused_kernel_packed16 ("vpu" ladder / "mm" MXU
    triangle; pair sums < 2^14 keep the 2-limb bf16 form exact).
    chunk=c (mm only): two-level scan against a (c, c) triangle --
    TLOH/c x fewer MACs and a c^2 instead of TLOH^2 resident triangle,
    recombined with an unrolled (TLOH/c - 1)-add prefix over chunk
    totals.  emit_odd=False skips the to/qo stores entirely: consumers
    hold the adv words and derive odd = even + (w >> 14) for free while
    walking ops (liftover.adv16_odd_offsets), so the kernel saves half
    its offset-output DMA.  raw_sums=True (implies emit_odd=False):
    words are raw GROUP sums (liftover.pack_ops_sums, values < 2^16 --
    per-limb tile sums stay < 255 * TLOH << 2^24 so the 2-limb form
    stays exact), no mask/shift at all; outputs are group-prefix
    anchors (liftover.expand_group_prefix reconstructs per-op
    offsets).  catmode=True: ONE category plane (pack_cat_nibbles)
    replaces the tw/qw pair -- classify._kernel_cat body, half the
    column input.

    scan_mode="once" (round 5): the op tables and offset outputs stay
    RESIDENT across the column steps (constant block index) and the
    WHOLE scan runs at j == 0 as one full-width int32 Hillis ladder --
    the per-step scan's fixed overhead (extra DMA streams, MXU spin-up,
    carry serialization) made the fused kernel trail the standalone
    classify ~13% even though the g8 op tile is 1/32 of the column
    tile; scan-once measured 897.2 vs per-step-mm 804.6 Gcol/s
    same-window (classify-only control 987.8, scripts/ab_scan_once.py).
    Requires the whole op row-block in VMEM -- the wrapper bounds NOHp."""
    if catmode:
        cw_ref, wt_ref, wq_ref, *rest = refs
    else:
        tw_ref, qw_ref, wt_ref, wq_ref, *rest = refs
    n_off = 4 if emit_odd else 2
    if scan_mode == "mm":
        tri_ref = rest[0]
        rest = rest[1:]
    else:
        tri_ref = None
    out_ref, edge_ref = rest[0], rest[1]
    off_refs = rest[2 : 2 + n_off]
    carry_ref = rest[2 + n_off]
    if catmode:
        _kernel_cat(cw_ref, out_ref, edge_ref, caller=caller)
    else:
        body = _kernel_nibbles if nibble else _kernel_words
        body(tw_ref, qw_ref, out_ref, edge_ref, caller=caller)
    j = pl.program_id(1)
    i32 = jnp.int32

    def lsr(x, k):
        return jax.lax.shift_right_logical(x, jnp.int32(k))

    if scan_mode == "once":

        @pl.when(j == 0)
        def _():
            wt = wt_ref[:]
            wq = wq_ref[:]
            if raw_sums:
                ct, cq = wt, wq
            else:
                m14 = jnp.int32(0x3FFF)
                ct = wt & m14
                cq = wq & m14
            TB = ct.shape[0]
            zero_carry = jnp.zeros((TB, 2), i32)
            p_t, p_q = _hillis_scan_pair(ct, cq, zero_carry)
            if emit_odd:
                te_ref, to_ref, qe_ref, qo_ref = off_refs
                te_ref[:] = p_t
                to_ref[:] = p_t + lsr(wt, 14)
                qe_ref[:] = p_q
                qo_ref[:] = p_q + lsr(wq, 14)
            else:
                te_ref, qe_ref = off_refs
                te_ref[:] = p_t
                qe_ref[:] = p_q

        return

    wt = wt_ref[:]
    wq = wq_ref[:]
    if raw_sums:
        assert not emit_odd
        ct, cq = wt, wq
    else:
        m14 = jnp.int32(0x3FFF)
        ct = wt & m14
        cq = wq & m14
    TB, TLOH = ct.shape

    @pl.when(j == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    carry = carry_ref[:]
    if scan_mode == "mm":
        p_t, p_q = _pair_prefix_mm(ct, cq, tri_ref[:], chunk=chunk)
        p_t = p_t + carry[:, 0:1]
        p_q = p_q + carry[:, 1:2]
    else:
        p_t, p_q = _hillis_scan_pair(ct, cq, carry)
    if emit_odd:
        te_ref, to_ref, qe_ref, qo_ref = off_refs
        te_ref[:] = p_t
        to_ref[:] = p_t + lsr(wt, 14)
        qe_ref[:] = p_q
        qo_ref[:] = p_q + lsr(wq, 14)
    else:
        te_ref, qe_ref = off_refs
        te_ref[:] = p_t
        qe_ref[:] = p_q
    carry_ref[:] = jnp.concatenate(
        [
            p_t[:, TLOH - 1 : TLOH] + ct[:, TLOH - 1 : TLOH],
            p_q[:, TLOH - 1 : TLOH] + cq[:, TLOH - 1 : TLOH],
        ],
        axis=1,
    )


def _fused_kernel_packed(
    tw_ref,
    qw_ref,
    opw_ref,
    out_ref,
    edge_ref,
    toff_ref,
    qoff_ref,
    carry_ref,
    *,
    caller=False,
):
    """Packed-op variant: ONE int32 op-word tile (op byte << 24 | len),
    VPU Hillis scan (no triangle input at all)."""
    _kernel_words(tw_ref, qw_ref, out_ref, edge_ref, caller=caller)
    j = pl.program_id(1)
    _liftover_block(
        opw_ref[:], None, None, toff_ref, qoff_ref, carry_ref, j,
        scan_mode="vpu",
    )


def _pad_fused_inputs(
    tw, qw, lengths, op_planes, tile_b, tile_lw, tile_lo, nibble=False,
    catmode=False,
):
    """Shared batch padding for the fused wrappers.

    Word planes pad to tile multiples with gap words (the padding
    corrections in _finish_stats account for them exactly); op planes
    pad with zeros, split over the same number of column-axis steps;
    every row count pads to a common row-block multiple (the two stages
    never mix rows, so the extra tiles just compute zeros).

    nibble=True: planes are 4-bit dictionary words where the gap code
    is 0, so the pad word is 0 instead of '----'.  catmode=True: ONE
    category plane (qw is None), gap/gap columns pack to nibble 9.

    Returns (tw, qw, lengths, op_planes, dims) with dims =
    (Bp, B2p, LW, NOp, ns, nb, tile_lo, pad_rows)."""
    B, LW = tw.shape
    B2, NO = op_planes[0].shape
    if catmode:
        gapw = jnp.int32(_GGW32)
    elif nibble:
        gapw = jnp.int32(0)
    else:
        gapw = jnp.int32(int(np.int32(np.uint32(0x2D2D2D2D))))
    if LW % tile_lw or LW == 0:
        LW2 = max(((LW + tile_lw - 1) // tile_lw) * tile_lw, tile_lw)
        tw = jnp.pad(tw, ((0, 0), (0, LW2 - LW)), constant_values=gapw)
        if qw is not None:
            qw = jnp.pad(qw, ((0, 0), (0, LW2 - LW)), constant_values=gapw)
        LW = LW2
    if B % tile_b:
        Bp = ((B + tile_b - 1) // tile_b) * tile_b
        tw = jnp.pad(tw, ((0, Bp - B), (0, 0)), constant_values=gapw)
        if qw is not None:
            qw = jnp.pad(qw, ((0, Bp - B), (0, 0)), constant_values=gapw)
        lengths = jnp.pad(lengths, (0, Bp - B))
        pad_rows = Bp - B
    else:
        Bp = B
        pad_rows = 0

    ns = LW // tile_lw
    if tile_lo is None:
        tile_lo = max(((NO + ns - 1) // ns + 127) // 128 * 128, 128)
    NOp = ns * tile_lo
    if NOp != NO:
        op_planes = [
            jnp.pad(o, ((0, 0), (0, NOp - NO))) for o in op_planes
        ]
    if B2 % tile_b:
        B2p = ((B2 + tile_b - 1) // tile_b) * tile_b
        op_planes = [
            jnp.pad(o, ((0, B2p - B2), (0, 0))) for o in op_planes
        ]
    else:
        B2p = B2

    nb = max(Bp, B2p) // tile_b
    if Bp < nb * tile_b:
        tw = jnp.pad(
            tw, ((0, nb * tile_b - Bp), (0, 0)), constant_values=gapw
        )
        if qw is not None:
            qw = jnp.pad(
                qw, ((0, nb * tile_b - Bp), (0, 0)), constant_values=gapw
            )
        lengths = jnp.pad(lengths, (0, nb * tile_b - Bp))
        pad_rows += nb * tile_b - Bp
        Bp = nb * tile_b
    if B2p < nb * tile_b:
        op_planes = [
            jnp.pad(o, ((0, nb * tile_b - B2p), (0, 0))) for o in op_planes
        ]
        B2p = nb * tile_b
    dims = (Bp, B2p, LW, NOp, ns, nb, tile_lo, pad_rows)
    return tw, qw, lengths, op_planes, dims


def _finish_fused_stats(out, edges, ns, LW, tw, qw, lengths, caller,
                        pad_rows, nibble=False, catmode=False):
    """Shared classify finish: last real column from the word planes +
    the exact tile-boundary / padding corrections.  nibble=True
    extracts 4-bit dictionary codes (8 per word, gap code 0) instead of
    bytes; catmode=True extracts the category nibble directly (tw is
    the cat plane, qw is None)."""
    if catmode:
        last_real_cat = _cat_last_real(tw, lengths, caller)
        return _finish_stats(
            out, edges, ns, 8 * LW, lengths, last_real_cat, caller,
            pad_rows,
        )
    cpw = 8 if nibble else 4
    L = cpw * LW
    last_idx = jnp.maximum(lengths - 1, 0)
    widx = last_idx // cpw
    bits = 4 if nibble else 8
    shift = ((last_idx % cpw) * bits).astype(jnp.int32)
    wv_t = jnp.take_along_axis(tw, widx[:, None], axis=1)[:, 0]
    wv_q = jnp.take_along_axis(qw, widx[:, None], axis=1)[:, 0]
    m = jnp.int32(0xF if nibble else 0xFF)
    bt = jax.lax.shift_right_logical(wv_t, shift) & m
    bq = jax.lax.shift_right_logical(wv_q, shift) & m
    if nibble:
        last_real_cat = _classify_codes(bt, bq, caller)
    else:
        last_real_cat = _classify(bt, bq, caller).astype(jnp.int32)
    return _finish_stats(
        out, edges, ns, L, lengths, last_real_cat, caller, pad_rows
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_b", "tile_lw", "tile_loh", "interpret", "caller", "nibble",
        "scan_mode",
    ),
)
def classify_liftover_fused16(
    tw,
    qw,
    lengths,
    opw16,
    tile_b=64,
    tile_lw=None,
    tile_loh=None,
    interpret=False,
    caller=False,
    nibble=False,
    scan_mode="vpu",
):
    """One-pass classify stats + liftover offsets, 16-bit packed ops.

    opw16: int32 [B2, NOH] from liftover.pack_ops_words16 (two ops per
    word, every length < 2^13 -- callers guard and fall back to the
    32-bit path).  Returns (stats [B, 8], t_even, t_odd, q_even, q_odd)
    with the offset of op 2k at *_even[:, k] and op 2k+1 at *_odd[:, k];
    liftover.interleave_halves zips them when a flat [B2, 2*NOH] table
    is needed.  Bit-identical to the 32-bit paths (tested).

    nibble=True: tw/qw are 4-bit dictionary-packed planes from
    classify.pack_nibble_words (8 columns per lane, gap code 0) -- half
    the column DMA of the byte-word form; default tile_lw drops to 4096
    (the same 32768 columns per tile at half the VMEM bytes, and
    tile_lw*8 must stay < 2^16 for the packed counter fields).

    scan_mode: "vpu" (Hillis ladder) or "mm" (2-limb bf16 triangle
    matmul on the otherwise-idle MXU -- exact for packed16 pair sums,
    see _fused_kernel_packed16)."""
    if tile_lw is None:
        tile_lw = 4096 if nibble else 8192
    cpw = 8 if nibble else 4
    B, LW0 = tw.shape
    B2, NOH = opw16.shape
    tile_b = min(tile_b, max(B, B2))
    tile_b = ((tile_b + 7) // 8) * 8  # sublane-aligned row blocks
    tile_lw = min(tile_lw, max(LW0, 128))
    assert tile_lw * cpw < (1 << 16), "tile columns must be < 2^16"
    tw, qw, lengths, (opw16,), dims = _pad_fused_inputs(
        tw, qw, lengths, [opw16], tile_b, tile_lw, tile_loh, nibble=nibble
    )
    Bp, B2p, LW, NOHp, ns, nb, tile_loh, pad_rows = dims

    word_spec = pl.BlockSpec(
        (tile_b, tile_lw), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    op_spec = pl.BlockSpec(
        (tile_b, tile_loh), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    in_specs = [word_spec, word_spec, op_spec]
    inputs = [tw, qw, opw16]
    if scan_mode == "mm":
        # strictly-lower (TLOH, TLOH) triangle, VMEM-resident across
        # grid steps (constant block index)
        ir = jax.lax.broadcasted_iota(jnp.int32, (tile_loh, tile_loh), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (tile_loh, tile_loh), 1)
        tri = jnp.clip(ir - ic, 0, 1).astype(jnp.bfloat16)
        in_specs.append(
            pl.BlockSpec(
                (tile_loh, tile_loh),
                lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(tri)
    out, edges, te, to, qe, qo = pl.pallas_call(
        functools.partial(
            _fused_kernel_packed16, caller=caller, nibble=nibble,
            scan_mode=scan_mode,
        ),
        grid=(nb, ns),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (tile_b, N_STATS),
                lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_b, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            op_spec,
            op_spec,
            op_spec,
            op_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, N_STATS), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 128 * ns), jnp.int32),
            jax.ShapeDtypeStruct((B2p, NOHp), jnp.int32),
            jax.ShapeDtypeStruct((B2p, NOHp), jnp.int32),
            jax.ShapeDtypeStruct((B2p, NOHp), jnp.int32),
            jax.ShapeDtypeStruct((B2p, NOHp), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_b, 2), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=14 * Bp * LW + 45 * B2p * NOHp,
            bytes_accessed=8 * Bp * LW + 20 * B2p * NOHp,
            transcendentals=0,
        ),
    )(*inputs)

    stats = _finish_fused_stats(
        out, edges, ns, LW, tw, qw, lengths, caller, pad_rows,
        nibble=nibble,
    )
    return (
        stats,
        te[:B2, :NOH],
        to[:B2, :NOH],
        qe[:B2, :NOH],
        qo[:B2, :NOH],
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_b", "tile_lw", "tile_loh", "interpret", "caller", "nibble",
        "catmode", "scan_mode", "chunk", "emit_odd", "raw_sums",
    ),
)
def classify_liftover_fused_adv16(
    tw,
    qw,
    lengths,
    wt,
    wq,
    tile_b=64,
    tile_lw=None,
    tile_loh=None,
    interpret=False,
    caller=False,
    nibble=False,
    catmode=False,
    scan_mode="vpu",
    chunk=None,
    emit_odd=True,
    raw_sums=False,
):
    """One-pass classify stats + liftover offsets, ADVANCE-packed ops.

    wt, wq: int32 [B2, NOH] from liftover.pack_ops_adv16 (per op pair
    and direction: (adv_even << 14) | pair_sum) -- the decode-free fast
    path; same guards as the packed16 form (every length < 2^13,
    M/=/X/I/S/D ops only).  Returns the same (stats, t_even, t_odd,
    q_even, q_odd) contract as classify_liftover_fused16, bit-identical
    to it and to the 32-bit paths (tested).

    chunk=c ("mm" only): two-level scan against a (c, c) triangle
    (must divide tile_loh).  emit_odd=False returns (stats, t_even,
    q_even) only -- callers derive the odd offsets from the adv words
    they already hold (odd = even + (w >> 14),
    liftover.adv16_odd_offsets), saving half the offset-output DMA.
    raw_sums=True: wt/wq are raw group-sum words (pack_ops_sums);
    returns (stats, t_anchor, q_anchor) group-prefix anchors
    (expand_group_prefix -> per-op offsets); forces emit_odd=False.

    catmode=True: tw is ONE category plane from
    classify.pack_cat_nibbles (qw must be None) -- half the column
    input and ~40% fewer classify vreg-ops (classify._kernel_cat).

    scan_mode="once" (round 5): op tables + offset outputs resident
    across column steps, whole scan at j == 0 as a full-width int32
    Hillis ladder (+11.5% over per-step mm, scripts/ab_scan_once.py);
    auto-falls back to "mm" when the resident op blocks would not fit
    VMEM (op words > ~6 MB per row block)."""
    if raw_sums:
        emit_odd = False
    if tile_lw is None:
        tile_lw = 4096 if (nibble or catmode) else 8192
    cpw = 8 if (nibble or catmode) else 4
    B, LW0 = tw.shape
    B2, NOH = wt.shape
    tile_b = min(tile_b, max(B, B2))
    tile_b = ((tile_b + 7) // 8) * 8  # sublane-aligned row blocks
    tile_lw = min(tile_lw, max(LW0, 128))
    assert tile_lw * cpw < (1 << 16), "tile columns must be < 2^16"
    if catmode:
        assert qw is None, "catmode takes ONE category plane"
    tw, qw, lengths, (wt, wq), dims = _pad_fused_inputs(
        tw, qw, lengths, [wt, wq], tile_b, tile_lw, tile_loh,
        nibble=nibble, catmode=catmode,
    )
    Bp, B2p, LW, NOHp, ns, nb, tile_loh, pad_rows = dims

    n_off = 4 if emit_odd else 2
    if scan_mode == "once" and (
        (2 + n_off) * tile_b * NOHp * 4 > (6 << 20)
    ):
        # resident op blocks would blow the 16 MB VMEM budget next to
        # the column tiles -- keep the per-step MXU triangle form
        scan_mode = "mm"
    word_spec = pl.BlockSpec(
        (tile_b, tile_lw), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    if scan_mode == "once":
        # whole op row-block resident across the column steps
        op_spec = pl.BlockSpec(
            (tile_b, NOHp), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        )
    else:
        op_spec = pl.BlockSpec(
            (tile_b, tile_loh), lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        )
    if catmode:
        in_specs = [word_spec, op_spec, op_spec]
        inputs = [tw, wt, wq]
    else:
        in_specs = [word_spec, word_spec, op_spec, op_spec]
        inputs = [tw, qw, wt, wq]
    if scan_mode == "mm":
        tri_n = chunk or tile_loh
        # Mosaic cannot reshape to a sub-lane-width minor dim (the
        # (TB, TLOH) -> (TB*ns2, chunk) reshape needs chunk % 128 == 0)
        assert tri_n % 128 == 0 and tile_loh % tri_n == 0, (
            tile_loh, tri_n,
        )
        ir = jax.lax.broadcasted_iota(jnp.int32, (tri_n, tri_n), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (tri_n, tri_n), 1)
        tri = jnp.clip(ir - ic, 0, 1).astype(jnp.bfloat16)
        in_specs.append(
            pl.BlockSpec(
                (tri_n, tri_n),
                lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(tri)
    outs = pl.pallas_call(
        functools.partial(
            _fused_kernel_adv16, caller=caller, nibble=nibble,
            catmode=catmode, scan_mode=scan_mode, chunk=chunk,
            emit_odd=emit_odd, raw_sums=raw_sums,
        ),
        grid=(nb, ns),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (tile_b, N_STATS),
                lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_b, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ]
        + [op_spec] * n_off,
        out_shape=[
            jax.ShapeDtypeStruct((Bp, N_STATS), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 128 * ns), jnp.int32),
        ]
        + [jax.ShapeDtypeStruct((B2p, NOHp), jnp.int32)] * n_off,
        scratch_shapes=[pltpu.VMEM((tile_b, 2), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=14 * Bp * LW + 25 * B2p * NOHp,
            bytes_accessed=(4 if catmode else 8) * Bp * LW
            + 24 * B2p * NOHp,
            transcendentals=0,
        ),
    )(*inputs)
    out, edges = outs[0], outs[1]

    stats = _finish_fused_stats(
        out, edges, ns, LW, tw, qw, lengths, caller, pad_rows,
        nibble=nibble, catmode=catmode,
    )
    return (stats,) + tuple(o[:B2, :NOH] for o in outs[2:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_b", "tile_lw", "tile_lo", "interpret", "caller",
        "scan_chunk", "scan_mode",
    ),
)
def classify_liftover_fused(
    tw,
    qw,
    lengths,
    ops,
    lens,
    tile_b=32,
    tile_lw=8192,
    tile_lo=None,
    interpret=False,
    caller=False,
    scan_chunk=None,
    scan_mode="vpu",
):
    """One-pass classify stats + liftover offsets.

    tw, qw: int32 [B, LW] little-endian words of the column byte planes
    (zero-copy host `.view('<i4')`, same contract as
    classify_stat_pallas_words); lengths: int32 [B] in columns.

    Op table, either form:
    - ops: uint8 [B2, NO] (0 = padding) + lens: int32 [B2, NO], every
      length < 2^16; or
    - lens=None and ops: int32 [B2, NO] PACKED op words
      ((op byte << 24) | len, see liftover.pack_ops_words) -- one input
      stream instead of two (4 instead of 5 bytes/op of DMA, and no
      u8 widening relayout in-kernel); always uses the vpu scan.

    scan_mode: "vpu" (round-3 default -- int32 Hillis-Steele ladder,
    exact, no MXU) or "mm" (round-2 bf16-limb triangle matmuls,
    scan_chunk selects the two-level form).

    Returns (stats int32 [B, 8], t_off int32 [B2, NO], q_off int32
    [B2, NO]) -- bit-identical to classify_stat_pallas_words +
    liftover_scan_pallas.

    The op batch rides the classify grid: NO is padded so both inputs
    split into the same number of column-axis steps.  B and B2 are
    padded to a common row-tile multiple independently (the two stages
    never mix rows).
    """
    packed = lens is None
    if packed:
        scan_mode = "vpu"
    B, LW0 = tw.shape
    B2, NO = ops.shape
    tile_b = min(tile_b, max(B, B2))
    tile_b = ((tile_b + 7) // 8) * 8  # sublane-aligned row blocks
    tile_lw = min(tile_lw, max(LW0, 128))
    assert tile_lw * 4 < (1 << 16), "tile_lw*4 must be < 2^16"

    op_planes = [ops] if packed else [ops, lens.astype(jnp.int32)]
    tw, qw, lengths, op_planes, dims = _pad_fused_inputs(
        tw, qw, lengths, op_planes, tile_b, tile_lw, tile_lo
    )
    Bp, B2p, LW, NOp, ns, nb, tile_lo, pad_rows = dims
    ops = op_planes[0]
    if not packed:
        lens = op_planes[1]

    word_spec = pl.BlockSpec(
        (tile_b, tile_lw), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    op_spec = pl.BlockSpec(
        (tile_b, tile_lo), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    out_specs = [
        pl.BlockSpec(
            (tile_b, N_STATS),
            lambda i, j: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (tile_b, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        op_spec,
        op_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Bp, N_STATS), jnp.int32),
        jax.ShapeDtypeStruct((Bp, 128 * ns), jnp.int32),
        jax.ShapeDtypeStruct((B2p, NOp), jnp.int32),
        jax.ShapeDtypeStruct((B2p, NOp), jnp.int32),
    ]
    # the row-block axis is embarrassingly parallel (carry/accumulator
    # state is per row-block and resets at j == 0); telling Mosaic lets
    # the pipeline overlap across row-block transitions
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary")
    )
    if packed:
        out, edges, t_off, q_off = pl.pallas_call(
            functools.partial(_fused_kernel_packed, caller=caller),
            grid=(nb, ns),
            in_specs=[word_spec, word_spec, op_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((tile_b, 2), jnp.int32)],
            interpret=interpret,
            compiler_params=compiler_params,
            cost_estimate=pl.CostEstimate(
                flops=14 * Bp * LW + 30 * B2p * NOp,
                bytes_accessed=8 * Bp * LW + 12 * B2p * NOp,
                transcendentals=0,
            ),
        )(tw, qw, ops)
    else:
        if scan_mode == "vpu":
            tri_n = 8  # unused by the vpu scan; keep the input tiny
        else:
            tri_n = scan_chunk or tile_lo
            assert tile_lo % tri_n == 0, "scan_chunk must divide tile_lo"
        ir = jax.lax.broadcasted_iota(jnp.int32, (tri_n, tri_n), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (tri_n, tri_n), 1)
        tri = jnp.clip(ir - ic, 0, 1).astype(jnp.bfloat16)
        out, edges, t_off, q_off = pl.pallas_call(
            functools.partial(
                _fused_kernel, caller=caller, chunk=scan_chunk,
                scan_mode=scan_mode,
            ),
            grid=(nb, ns),
            in_specs=[
                word_spec,
                word_spec,
                op_spec,
                op_spec,
                pl.BlockSpec(
                    (tri_n, tri_n),
                    lambda i, j: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((tile_b, 2), jnp.int32)],
            interpret=interpret,
            compiler_params=compiler_params,
            cost_estimate=pl.CostEstimate(
                flops=14 * Bp * LW + 4 * B2p * NOp * tri_n,
                bytes_accessed=8 * Bp * LW + 13 * B2p * NOp,
                transcendentals=0,
            ),
        )(tw, qw, ops, lens.astype(jnp.int32), tri)

    stats = _finish_fused_stats(
        out, edges, ns, LW, tw, qw, lengths, caller, pad_rows
    )
    return stats, t_off[:B2, :NO], q_off[:B2, :NO]
