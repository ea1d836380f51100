"""Fused column-classify + statistics kernels.

The device replacement for the reference's per-column char loops
(reference: src/parser/cigar.rs:344-432, group_by over zipped chars).
A batch of alignment column pairs (target/query bytes, padded to [B, L])
is classified and reduced to per-record counters in one pass:

    [B, L] uint8 x2  ->  [B, 8] int32

counters: matched(=), mismatched(X), ins_size(I), del_size(D),
ins_events (I-run starts), del_events (D-run starts), gap/gap columns (W),
total run count (RLE boundary count, for host-side CIGAR sizing).

Two implementations with identical numerics:
  * classify_stat_jnp    -- pure jnp, XLA-fused; used as reference and for
                            CPU fallbacks.
  * classify_stat_pallas -- Pallas TPU kernel, tiled over (B, L) with VMEM
                            blocks; padding + tile-boundary effects are
                            corrected exactly outside the kernel (Mosaic
                            constraints: no sub-32-bit compares, no
                            broadcast i1 relayouts -- see _classify).

Categories use the ext table (cigar_cat_ext, cigar.rs:298-308):
'=' when bytes are equal (including gap/gap), I/D for one-sided gaps, X
otherwise.  Gap/gap W columns are counted separately so the caller-mode
interpretation (cigar_cat_ext_caller) can be derived from the same pass.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GAP = ord("-")

# stat column indices
STAT_MATCHED = 0
STAT_MISMATCHED = 1
STAT_INS_SIZE = 2
STAT_DEL_SIZE = 3
STAT_INS_EVENT = 4
STAT_DEL_EVENT = 5
STAT_GAPGAP = 6
STAT_RUNS = 7
N_STATS = 8

# category codes (match core.cigar)
EQ, X, I, D, W = 0, 1, 2, 3, 4

# sentinel category for "column before the first": never equal to any real
# category, so run starts at column 0 are always counted
_NO_CAT = 255


def _classify(t, q, caller=False):
    """Category codes from byte tensors.

    ext mode (default): cigar_cat_ext -- equal bytes (incl. gap/gap) -> EQ.
    caller mode: cigar_cat_ext_caller -- gap/gap -> W.

    Byte equality is computed as xor-then-widen-then-compare-to-zero:
    Mosaic (v5e) rejects direct sub-32-bit comparisons ("Target does not
    support this comparison") but lowers u8 xor + zero-extend + i32
    compare fine; XLA fuses either form identically on the jnp path."""
    eq = (t ^ q).astype(jnp.int32) == 0
    ti = (t ^ jnp.uint8(GAP)).astype(jnp.int32) == 0
    qi = (q ^ jnp.uint8(GAP)).astype(jnp.int32) == 0
    if caller:
        return jnp.where(
            ti,
            jnp.where(qi, W, I),
            jnp.where(qi, D, jnp.where(eq, EQ, X)),
        ).astype(jnp.uint8)
    return jnp.where(eq, EQ, jnp.where(ti, I, jnp.where(qi, D, X))).astype(
        jnp.uint8
    )


def _gapgap(t, q):
    ti = (t ^ jnp.uint8(GAP)).astype(jnp.int32) == 0
    qi = (q ^ jnp.uint8(GAP)).astype(jnp.int32) == 0
    return ti & qi


def _stats_from_cat(cat, prev_cat, gapgap_mask, mask=None):
    """Per-record counter reduction over one (tile of a) category array.

    mask=None means all columns are valid (the Pallas kernel path: masking
    is replaced by padding + exact corrections because Mosaic's layout
    engine rejects broadcast i1 relayouts)."""
    i32 = jnp.int32
    is_eq = cat == EQ
    is_x = cat == X
    is_i = cat == I
    is_d = cat == D
    run_start = cat != prev_cat
    i_start = is_i & (prev_cat != I)
    d_start = is_d & (prev_cat != D)
    gg = gapgap_mask
    if mask is not None:
        is_eq = is_eq & mask
        is_x = is_x & mask
        is_i = is_i & mask
        is_d = is_d & mask
        run_start = run_start & mask
        i_start = i_start & mask
        d_start = d_start & mask
        gg = gg & mask
    return jnp.stack(
        [
            jnp.sum(is_eq, axis=1, dtype=i32),
            jnp.sum(is_x, axis=1, dtype=i32),
            jnp.sum(is_i, axis=1, dtype=i32),
            jnp.sum(is_d, axis=1, dtype=i32),
            jnp.sum(i_start, axis=1, dtype=i32),
            jnp.sum(d_start, axis=1, dtype=i32),
            jnp.sum(gg, axis=1, dtype=i32),
            jnp.sum(run_start, axis=1, dtype=i32),
        ],
        axis=1,
    )


@functools.partial(jax.jit, static_argnames=("caller",))
def classify_stat_jnp(t, q, lengths, caller=False):
    """Reference jnp implementation.  t, q: uint8 [B, L]; lengths: int32 [B].

    caller=True classifies with the caller table (gap/gap -> W,
    cigar_cat_ext_caller, cigar.rs:310-320): matched then excludes
    gap/gap columns and STAT_RUNS is the caller-mode run count (a
    gap/gap run is its own W run).  Returns int32 [B, 8].
    """
    B, L = t.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    mask = col < lengths[:, None]
    cat = _classify(t, q, caller)
    prev_cat = jnp.concatenate(
        [jnp.full((B, 1), _NO_CAT, dtype=jnp.int32), cat[:, :-1].astype(jnp.int32)],
        axis=1,
    )
    return _stats_from_cat(cat, prev_cat, _gapgap(t, q), mask)


def _kernel(t_ref, q_ref, out_ref, edge_ref, *, caller=False):
    """Pallas kernel body: one (TB, TL) tile; accumulates into [TB, 8]
    and records the tile's first/last categories into edge_ref [TB, 2].

    The kernel is completely unmasked and tile-local: every comparison is
    elementwise on same-shape byte tiles (no broadcasts, which Mosaic's
    layout engine rejects for i1 vectors).  The caller guarantees padding
    bytes are '-'/'-' (classifying as '=') and applies exact padding and
    tile-boundary corrections outside (see classify_stat_pallas).  The
    edge-category side output exists for those corrections: gathering the
    boundary columns from the full [B, L] HBM arrays instead cost ~35% of
    the whole call at L=4M, and carrying the previous tile's category in
    a scratch (exact inline counting) serialized the grid pipeline and
    measured 60% slower (scripts/ab_wrapper.py, 2026-08-17).

    Formulation notes (same-process A/B on the v5e chip, 2026-08-17,
    scripts/ab_classify.py):
    - widening t/q ONCE each to i32 (2 relayouts) and xor-ing in i32
      space beats three u8-xor-then-widen chains; ti/qi shared with the
      gap/gap stat and i/d run starts derived as `is_i & run_start`;
    - the 8 per-stat tile reductions are packed into 4: two counters
      ride one int32 as 16-bit fields (per-tile counts <= TL <= 0xFFFF,
      so the low field cannot carry; the high field may wrap the sign
      bit at TL=2^15 -- bit extraction below is wrap-safe).  Mosaic
      cannot reduce unsigned ints, hence int32 fields;
    - combined, 200.0 vs 101.3 Gcol/s for the previous i32-cat kernel
      (min-of-9 alternating marginal rates, B=32 L=4M);
    - pltpu.roll for the 1-column shift (with column 0 forced to be a run
      start, since roll wraps) beats jnp.concatenate ~15%."""
    j = pl.program_id(1)

    t32 = t_ref[:].astype(jnp.int32)
    q32 = q_ref[:].astype(jnp.int32)
    gap = jnp.int32(GAP)
    eq = (t32 ^ q32) == 0
    ti = (t32 ^ gap) == 0
    qi = (q32 ^ gap) == 0
    if caller:
        # cigar_cat_ext_caller (cigar.rs:314-328): gap/gap -> W
        cat = jnp.where(
            ti, jnp.where(qi, W, I), jnp.where(qi, D, jnp.where(eq, EQ, X))
        )
        is_eq = eq & ~ti
    else:
        cat = jnp.where(eq, EQ, jnp.where(ti, I, jnp.where(qi, D, X)))
        is_eq = eq
    gg = ti & qi
    TL = cat.shape[1]
    # prev wraps within the tile (roll); column 0's start/continuation
    # accounting happens exactly in _finish_stats from the edge output
    prev_cat = pltpu.roll(cat, 1, axis=1)
    run_start = cat != prev_cat
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
    # lane-dim blocks must be 128-divisible: the two categories ride a
    # 128-wide slot (first at lane 0, last at lane 1, rest zero)
    pad_lanes = jnp.zeros((cat.shape[0], 126), jnp.int32)
    edge_ref[:] = jnp.concatenate(
        [cat[:, 0:1], cat[:, TL - 1 : TL], pad_lanes], axis=1
    )


@functools.partial(
    jax.jit, static_argnames=("tile_b", "tile_l", "interpret", "caller")
)
def classify_stat_pallas(
    t, q, lengths, tile_b=32, tile_l=32768, interpret=False, caller=False
):
    """Pallas TPU kernel.  t, q: uint8 [B, L]; lengths: int32 [B].

    Tile default (32, 32768): beat (8, 32768) ~14% and (8, 16384) ~23%
    in the same-process sweep (scripts/ab_classify_tiles.py, 2026-08-17).

    CONTRACT: padding bytes (columns >= lengths[b]) must be '-' in both t
    and q (pack_pairs guarantees this).  Padding columns classify as '='
    (ext mode) or W (caller mode) and form at most one trailing run; their
    contribution is subtracted exactly below, so the result equals the
    masked jnp implementation in either mode.
    """
    B, L = t.shape
    tile_b = min(tile_b, B)
    tile_b = ((tile_b + 7) // 8) * 8  # sublane-aligned row blocks
    # lane-dim blocks must stay >= 128 (Mosaic (8,128) alignment):
    # a small trailing flush batch pads up instead of shrinking the tile
    tile_l = min(tile_l, max(L, 128))
    # the kernel packs two counters into 16-bit fields of one int32;
    # per-tile counts must fit 16 bits
    assert tile_l <= 0xFFFF, "tile_l must be < 2^16 (16-bit field packing)"
    # the grid must cover the array exactly: a partial final tile would
    # read out-of-bounds block padding, which is not '-'/'-' and would
    # corrupt the counters -- extend the arrays with gap columns instead
    # (they classify as '=' and are covered by the padding corrections)
    if L % tile_l:
        L2 = ((L + tile_l - 1) // tile_l) * tile_l
        t = jnp.pad(t, ((0, 0), (0, L2 - L)), constant_values=GAP)
        q = jnp.pad(q, ((0, 0), (0, L2 - L)), constant_values=GAP)
        L = L2
    if B % tile_b:
        B2 = ((B + tile_b - 1) // tile_b) * tile_b
        t = jnp.pad(t, ((0, B2 - B), (0, 0)), constant_values=GAP)
        q = jnp.pad(q, ((0, B2 - B), (0, 0)), constant_values=GAP)
        lengths = jnp.pad(lengths, (0, B2 - B))
        pad_rows = B2 - B
        B = B2
    else:
        pad_rows = 0
    nb = pl.cdiv(B, tile_b)
    nl = pl.cdiv(L, tile_l)

    grid = (nb, nl)
    out, edges = pl.pallas_call(
        functools.partial(_kernel, caller=caller),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_b, tile_l), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_b, tile_l), lambda i, j: (i, j), memory_space=pltpu.VMEM
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
        cost_estimate=pl.CostEstimate(
            flops=12 * B * L, bytes_accessed=2 * B * L + 4 * B * N_STATS,
            transcendentals=0,
        ),
    )(t, q)

    last_idx = jnp.maximum(lengths - 1, 0)
    last_real_cat = _classify(
        jnp.take_along_axis(t, last_idx[:, None], axis=1),
        jnp.take_along_axis(q, last_idx[:, None], axis=1),
        caller,
    )[:, 0].astype(jnp.int32)
    return _finish_stats(
        out, edges, nl, L, lengths, last_real_cat, caller, pad_rows
    )


def _finish_stats(out, edges, nl, L, lengths, last_real_cat, caller, pad_rows):
    """Exact tile-boundary + padding corrections shared by the byte and
    word kernels.

    Cross-tile (round 3): the kernels count a run start at a tile's
    column 0 only when its category differs from the tile's LAST column
    (pltpu.roll wraps within the tile -- no per-word start forcing at
    all).  The truth is: tile 0's column 0 always starts a run; tile
    j>0's column 0 starts one iff its category differs from tile j-1's
    last.  Both the counted and the true boundary terms derive from the
    kernel's tiny edge side output (gathering the edge columns from the
    full [B, L] HBM arrays instead cost ~35% of the whole call at L=4M,
    scripts/bench_split.py 2026-08-17), so the correction is

        corr_j = [F_j != L_j] - (j == 0 ? 1 : [F_j != L_{j-1}])

    summed per row (possibly negative), with the same gating for the
    I/D run-start counters.

    Padding: columns >= len are '-'/'-' => gap/gap, which classifies '='
    in ext mode (also counted in matched) and W in caller mode (gapgap
    only); the padding run is one extra run unless it merged with a
    trailing real run of the padding's category."""
    B = out.shape[0]
    corr = jnp.zeros((B, N_STATS), dtype=jnp.int32)
    e3 = edges.reshape(B, nl, 128)
    first_cat = e3[:, :, 0]
    last_cat = e3[:, :, 1]
    counted = (first_cat != last_cat).astype(jnp.int32)
    prev_last = jnp.concatenate(
        # tile 0's "previous last" is a sentinel no category equals, so
        # its true term is always 1
        [jnp.full((B, 1), _NO_CAT, jnp.int32), last_cat[:, :-1]], axis=1
    )
    true_start = (first_cat != prev_last).astype(jnp.int32)
    delta = counted - true_start
    corr = corr.at[:, STAT_RUNS].add(jnp.sum(delta, axis=1, dtype=jnp.int32))
    is_i_first = (first_cat == I).astype(jnp.int32)
    is_d_first = (first_cat == D).astype(jnp.int32)
    corr = corr.at[:, STAT_INS_EVENT].add(
        jnp.sum(delta * is_i_first, axis=1, dtype=jnp.int32)
    )
    corr = corr.at[:, STAT_DEL_EVENT].add(
        jnp.sum(delta * is_d_first, axis=1, dtype=jnp.int32)
    )

    pad = (L - lengths).astype(jnp.int32)
    if not caller:
        corr = corr.at[:, STAT_MATCHED].add(pad)
    corr = corr.at[:, STAT_GAPGAP].add(pad)
    has_pad = lengths < L
    merged = (lengths > 0) & (last_real_cat == (W if caller else EQ))
    corr = corr.at[:, STAT_RUNS].add(
        jnp.where(has_pad & ~merged, 1, 0).astype(jnp.int32)
    )
    result = out - corr
    if pad_rows:
        result = result[:-pad_rows]
    return result


# ---------------------------------------------------------------------------
# Word-packed (SWAR) variant: inputs arrive as little-endian int32 words
# (4 columns per lane).  Every elementwise op covers 4 columns and NO
# u8->i32 widening relayouts happen at all: 211 vs 121 Gcol/s same-process
# vs the byte kernel (scripts/ab_swar.py, 2026-08-17).  The words MUST be
# produced by a zero-copy host view (numpy `.view('<i4')`) -- a device-side
# bitcast of the byte tensor lowers catastrophically (6.9 Gcol/s measured)
# and defeats the point.
# ---------------------------------------------------------------------------

_HI32 = int(np.int32(np.uint32(0x80808080)))
_GAPW32 = int(np.int32(np.uint32(0x2D2D2D2D)))  # '----' as one LE word


def _kernel_words(t_ref, q_ref, out_ref, edge_ref, *, caller=False):
    """SWAR body: one (TB, TLW) int32 word tile -> [TB, 8] + edge slot.

    Per-byte indicators ride the high bit of each byte (nonzero-byte
    trick); per-word counts come from a 0x01010101 multiply (beats the
    shift-add ladder 211 vs 177 Gcol/s); reductions use the same 16-bit
    field packing as the byte kernel.  Run boundaries diff a per-byte
    one-hot category word against its 1-byte shift with the previous
    word's top byte carried via pltpu.roll.

    Round-3 trims (the kernel is VPU-bound; scripts/ab_words3.py
    measured 286.6 vs 259.9 Gcol/s like-for-like):
    - X counts DERIVE from the column partition per tile
      (x = 4*TLW - eq - i - d [- gg in caller mode]); no x_hi mask, no
      cnt(x) multiply;
    - the boundary code word is one-hot-ish (eq|i<<1|d<<2[|gg<<3],
      x -> 0) -- distinct per-byte values are all run detection needs;
      the tile-edge side output translates its two lanes back to the
      standard EQ/X/I/D/W codes so _finish_stats stays unchanged;
    - ext-mode d_hi drops a redundant ~ti (q-gap & not-equal already
      implies t is not a gap: gap/gap columns are byte-equal)."""
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
        # caller table (cigar.rs:314-328): gap/gap -> W
        i_hi = ti_hi & ~qi_hi
        d_hi = qi_hi & ~ti_hi
        is_eq_hi = eq_hi & ~ti_hi
        catw = (
            lsr(is_eq_hi, 7)
            | lsr(i_hi, 6)
            | lsr(d_hi, 5)
            | lsr(gg_hi, 4)
        )
    else:
        ne = HI & ~eq_hi
        i_hi = ti_hi & ne
        d_hi = qi_hi & ne
        is_eq_hi = eq_hi
        catw = lsr(is_eq_hi, 7) | lsr(i_hi, 6) | lsr(d_hi, 5)
    # prev wraps within the tile (roll): byte0 of word0 compares against
    # the tile's LAST byte; _finish_stats reconstructs the true tile-edge
    # run starts from the edge output (cheaper than forcing a start on
    # every word with an iota compare)
    carried = lsr(pltpu.roll(catw, 1, axis=1), 24) & jnp.int32(0xFF)
    prevw = (catw << 8) | carried
    diff = catw ^ prevw
    rs_hi = nz_hi(diff)

    def cnt(m):
        # per-word count (0..4) of set high bits in an 0x80-mask
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
    # X from the column partition: ext has eq+i+d+x = 4*LW (eq includes
    # gap/gap); caller has eq+i+d+gg+x = 4*LW
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
    # EQ=0/X=1/I=2/D=3/W=4 codes _finish_stats expects (one-hot values:
    # eq=1, i=2, d=4, gg=8, x=0)
    first_c = catw[:, 0:1] & jnp.int32(0xFF)
    last_c = lsr(catw[:, LW - 1 : LW], 24)

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
def classify_stat_pallas_words(
    tw, qw, lengths, tile_b=32, tile_lw=8192, interpret=False, caller=False
):
    """Word-packed Pallas kernel.  tw, qw: int32 [B, L//4] little-endian
    words of the byte tensors (host `.view('<i4')` -- zero copy); lengths:
    int32 [B] in COLUMNS.  Identical output to classify_stat_pallas /
    classify_stat_jnp (tested).

    Same padding contract as the byte kernel: bytes at columns >=
    lengths[b] must be '-' in both inputs.
    """
    B, LW = tw.shape
    tile_b = min(tile_b, B)
    tile_b = ((tile_b + 7) // 8) * 8  # sublane-aligned row blocks
    # lane-dim blocks must stay >= 128 (Mosaic (8,128) alignment):
    # a small trailing flush batch pads up instead of shrinking the tile
    tile_lw = min(tile_lw, max(LW, 128))
    # per-tile column counts (4 per word) must fit the 16-bit fields
    assert tile_lw * 4 < (1 << 16), "tile_lw*4 must be < 2^16"
    gapw = jnp.int32(_GAPW32)
    if LW % tile_lw:
        LW2 = ((LW + tile_lw - 1) // tile_lw) * tile_lw
        tw = jnp.pad(tw, ((0, 0), (0, LW2 - LW)), constant_values=gapw)
        qw = jnp.pad(qw, ((0, 0), (0, LW2 - LW)), constant_values=gapw)
        LW = LW2
    if B % tile_b:
        B2 = ((B + tile_b - 1) // tile_b) * tile_b
        tw = jnp.pad(tw, ((0, B2 - B), (0, 0)), constant_values=gapw)
        qw = jnp.pad(qw, ((0, B2 - B), (0, 0)), constant_values=gapw)
        lengths = jnp.pad(lengths, (0, B2 - B))
        pad_rows = B2 - B
        B = B2
    else:
        pad_rows = 0
    L = 4 * LW
    nb = pl.cdiv(B, tile_b)
    nl = pl.cdiv(LW, tile_lw)

    out, edges = pl.pallas_call(
        functools.partial(_kernel_words, caller=caller),
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
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=14 * B * LW, bytes_accessed=8 * B * LW + 4 * B * N_STATS,
            transcendentals=0,
        ),
    )(tw, qw)

    # last real column's bytes, extracted from the words
    last_idx = jnp.maximum(lengths - 1, 0)
    widx = last_idx // 4
    shift = ((last_idx % 4) * 8).astype(jnp.int32)
    wv_t = jnp.take_along_axis(tw, widx[:, None], axis=1)[:, 0]
    wv_q = jnp.take_along_axis(qw, widx[:, None], axis=1)[:, 0]
    bt = jax.lax.shift_right_logical(wv_t, shift) & jnp.int32(0xFF)
    bq = jax.lax.shift_right_logical(wv_q, shift) & jnp.int32(0xFF)
    last_real_cat = _classify(bt, bq, caller).astype(jnp.int32)
    return _finish_stats(
        out, edges, nl, L, lengths, last_real_cat, caller, pad_rows
    )


# ---------------------------------------------------------------------------
# Nibble-packed (4-bit SWAR) variant: genomic alphabets fit 4 bits, so the
# host maps bytes through a fixed 15-symbol dictionary ('-' -> 0, ACGTNacgtn
# and '.' -> 1..11) and packs EIGHT columns per int32 word.  Classification
# only needs byte equality and gap identity, and the dictionary is a
# bijection on its domain, so code equality <=> byte equality exactly.
# Halves the classify HBM traffic (1 byte/column total for both planes) and
# doubles the columns covered per VPU op; gap code 0 makes gap detection a
# plain nonzero test (no xor against a gap pattern at all).  Batches with
# bytes outside the dictionary (rare IUPAC codes) stay on the byte/word
# kernels -- pack_nibble_words returns None and column_stats falls back.
# ---------------------------------------------------------------------------

_HI4 = int(np.int32(np.uint32(0x88888888)))
_M7_4 = 0x77777777
_NIB_ALPHABET = b"-ACGTNacgtn."  # '-' FIRST: gap must take code 0
_NIB_LUT = np.full(256, 255, dtype=np.uint8)
for _k, _b in enumerate(_NIB_ALPHABET):
    _NIB_LUT[_b] = _k


def pack_nibble_words(t, q, use_native=True):
    """Pack uint8 [B, L] byte planes into int32 [B, L//8] nibble words.

    Returns (tw, qw) with column j of a row in bits [4j, 4j+4) of word
    j//8 (little-endian nibble order), or None when any byte falls
    outside the 15-symbol dictionary (callers fall back to the byte/word
    kernels).  L must be a multiple of 8 (pack_pairs aligns to 128).
    Padding columns ('-'/'-', the pack_pairs contract) pack to 0x0/0x0.

    The hot path is the C++ one-pass validate+pack (native.pack_nibbles,
    fed this module's LUT so the alphabet cannot drift); the numpy
    fallback gathers the LUT then combines nibble pairs.
    """
    if t.shape[1] % 8:
        return None
    if use_native and t.flags.c_contiguous and q.flags.c_contiguous:
        from .. import native

        if native.available():
            tw = native.pack_nibbles(t, _NIB_LUT)
            if tw is None:
                return None
            qw = native.pack_nibbles(q, _NIB_LUT)
            if qw is None:
                return None
            return tw, qw
    ct = _NIB_LUT[t]
    cq = _NIB_LUT[q]
    if int(ct.max(initial=0)) == 255 or int(cq.max(initial=0)) == 255:
        return None

    def pack(c):
        b = c[:, 0::2] | (c[:, 1::2] << 4)
        return np.ascontiguousarray(b).view("<i4")

    return pack(ct), pack(cq)


def _kernel_nibbles(t_ref, q_ref, out_ref, edge_ref, *, caller=False):
    """4-bit SWAR body: one (TB, TLW) int32 nibble-word tile (8 columns
    per lane) -> [TB, 8] stats + edge slot.

    Same structure as _kernel_words at nibble width: per-column
    indicators ride bit 3 of each nibble (mask 0x88888888); the nonzero
    trick masks 0x77777777 and adds (carries cannot cross nibbles:
    (x&7)+7 <= 14 < 16); per-word counts (0..8) come from a 0x11111111
    multiply accumulating in the top nibble.  Gap code 0 means the gap
    indicators are plain nonzero tests of the planes themselves.  The
    boundary code word is one-hot per nibble (eq=1, i=2, d=4[, gg=8],
    x=0) diffed against its 4-bit shift with the previous word's top
    nibble carried via pltpu.roll."""
    j = pl.program_id(1)
    tw = t_ref[:]
    qw = q_ref[:]
    HI = jnp.int32(_HI4)
    M7 = jnp.int32(_M7_4)

    def lsr(x, k):
        return jax.lax.shift_right_logical(x, jnp.int32(k))

    def nz_hi(x):
        y = (x & M7) + M7
        return (y | x) & HI

    eq_hi = HI & ~nz_hi(tw ^ qw)
    # gap code is 0: "is gap" = nibble == 0 = NOT nonzero
    t_nz = nz_hi(tw)
    q_nz = nz_hi(qw)
    ti_hi = HI & ~t_nz
    qi_hi = HI & ~q_nz
    gg_hi = ti_hi & qi_hi
    if caller:
        i_hi = ti_hi & ~qi_hi
        d_hi = qi_hi & ~ti_hi
        is_eq_hi = eq_hi & ~ti_hi
        catw = (
            lsr(is_eq_hi, 3) | lsr(i_hi, 2) | lsr(d_hi, 1) | gg_hi
        )
    else:
        ne = HI & ~eq_hi
        i_hi = ti_hi & ne
        d_hi = qi_hi & ne
        is_eq_hi = eq_hi
        catw = lsr(is_eq_hi, 3) | lsr(i_hi, 2) | lsr(d_hi, 1)
    carried = lsr(pltpu.roll(catw, 1, axis=1), 28) & jnp.int32(0xF)
    prevw = (catw << 4) | carried
    diff = catw ^ prevw
    rs_hi = nz_hi(diff)

    def cnt(m):
        # per-word count (0..8) of set high bits in an 0x8-nibble mask
        return lsr(lsr(m, 3) * jnp.int32(0x11111111), 28)

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
    s_x = jnp.int32(8 * LW) - s_eq - s_i - s_d
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
    first_c = catw[:, 0:1] & jnp.int32(0xF)
    last_c = lsr(catw[:, LW - 1 : LW], 28) & jnp.int32(0xF)

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


def _classify_codes(ct, cq, caller):
    """_classify in nibble-code space (gap code 0; bijection => code
    equality == byte equality)."""
    eq = ct == cq
    ti = ct == 0
    qi = cq == 0
    if caller:
        return jnp.where(
            ti,
            jnp.where(qi, W, I),
            jnp.where(qi, D, jnp.where(eq, EQ, X)),
        ).astype(jnp.int32)
    return jnp.where(eq, EQ, jnp.where(ti, I, jnp.where(qi, D, X))).astype(
        jnp.int32
    )


@functools.partial(
    jax.jit, static_argnames=("tile_b", "tile_lw", "interpret", "caller")
)
def classify_stat_pallas_nibbles(
    tw, qw, lengths, tile_b=64, tile_lw=4096, interpret=False, caller=False
):
    """Nibble-packed Pallas kernel.  tw, qw: int32 [B, L//8] from
    pack_nibble_words (8 columns per lane, gap code 0); lengths: int32
    [B] in COLUMNS.  Identical output to classify_stat_jnp on the
    original byte planes (tested).

    Padding contract: columns >= lengths[b] pack to nibble 0 in both
    planes (gap/gap), the same shape the corrections in _finish_stats
    expect.  tile_lw*8 must stay < 2^16 for the packed 16-bit counter
    fields, hence the 4096 default (32768 columns per tile -- the same
    column footprint as the word kernel's 8192 at half the VMEM bytes).
    """
    B, LW = tw.shape
    tile_b = min(tile_b, B)
    tile_b = ((tile_b + 7) // 8) * 8  # sublane-aligned row blocks
    # lane-dim blocks must stay >= 128 (Mosaic (8,128) alignment):
    # a small trailing flush batch pads up instead of shrinking the tile
    tile_lw = min(tile_lw, max(LW, 128))
    assert tile_lw * 8 < (1 << 16), "tile_lw*8 must be < 2^16"
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
        functools.partial(_kernel_nibbles, caller=caller),
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
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=14 * B * LW, bytes_accessed=8 * B * LW + 4 * B * N_STATS,
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


# ---------------------------------------------------------------------------
# CATEGORY-plane (round 5) variant: the host packs the CLASSIFICATION of
# each column -- one 4-bit one-hot code per (t, q) byte pair via a 64K
# LUT -- instead of two nibble planes of base codes.  HALF the column DMA
# of the nibble form (0.5 byte/column total), and the kernel starts at
# the category word directly: the ~28 vreg-ops/word the nibble kernel
# spends deriving eq/gap indicators (3 SWAR nonzero chains + the
# indicator algebra) disappear, leaving ~42 of its ~72 ops/word.  The
# dictionary restriction disappears too: EVERY byte pair classifies
# through the total LUT, so there is no fallback path for rare IUPAC
# codes.  Same-process on-chip A/B: scripts/ab_cat.py.
#
# Codes are one-hot per nibble so counting is one AND + one 0x11111111
# multiply per class: X=0, EQ=1, I=2, D=4, GG=9 (bit 3 | bit 0: in ext
# mode gap/gap columns ARE '=' columns for both counts and run
# boundaries -- cigar_cat_ext, cigar.rs:298-308 -- so the run diff masks
# bit 3 and the matched count takes bit 0 of EQ and GG together; caller
# mode compares full nibbles, making GG=W its own category,
# cigar_cat_ext_caller, cigar.rs:314-328, and derives eq = bit0 - gg
# after the reduction).
# ---------------------------------------------------------------------------

CAT_X, CAT_EQ, CAT_I, CAT_D, CAT_GG = 0, 1, 2, 4, 9
_M1_4 = 0x11111111
_GGW32 = int(np.int32(np.uint32(0x99999999)))  # 8 gap/gap columns


def _build_cat_lut64k():
    t = np.arange(256, dtype=np.uint16)[:, None]
    q = np.arange(256, dtype=np.uint16)[None, :]
    tg = t == GAP
    qg = q == GAP
    eq = t == q
    lut = np.where(
        tg & qg,
        CAT_GG,
        np.where(tg, CAT_I, np.where(qg, CAT_D, np.where(eq, CAT_EQ, CAT_X))),
    ).astype(np.uint8)
    return np.ascontiguousarray(lut.reshape(-1))  # index = (t << 8) | q


_CAT_LUT64K = _build_cat_lut64k()


def pack_cat_nibbles(t, q, use_native=True):
    """Pack uint8 [B, L] byte planes into ONE int32 [B, L//8] category
    plane (column j's code in bits [4j, 4j+4) of word j//8).

    L must be a multiple of 8 (pack_pairs aligns to 128).  Padding
    columns ('-'/'-') pack to GG=9 -- the contract
    classify_stat_pallas_cat's corrections rely on.  Never fails: the
    64K LUT is total over byte pairs (no dictionary fallback needed).
    """
    if t.shape[1] % 8:
        return None
    if use_native and t.flags.c_contiguous and q.flags.c_contiguous:
        from .. import native

        if native.available():
            cw = native.pack_cats(t, q, _CAT_LUT64K)
            if cw is not None:
                return cw
    c = _CAT_LUT64K[
        (t.astype(np.uint16) << 8) | q.astype(np.uint16)
    ]
    b = c[:, 0::2] | (c[:, 1::2] << 4)
    return np.ascontiguousarray(b).view("<i4")


def _kernel_cat(c_ref, out_ref, edge_ref, *, caller=False):
    """Category-plane body: one (TB, TLW) int32 cat-word tile (8 columns
    per lane, one-hot nibble codes from pack_cat_nibbles) -> [TB, 8]
    stats + edge slot.

    Per-class counts are one AND + one 0x11111111 multiply (the host LUT
    already did the classification); run boundaries diff the word
    against its 4-bit shift with the previous word's top nibble carried
    via pltpu.roll.  Ext mode masks bit 3 out of the diff (GG codes
    differ from EQ only there, so gap/gap merges into '=' runs exactly
    as cigar_cat_ext requires) -- the masked diff has no bit-3 set, so
    its nonzero test is 2 ops (add M7, mask HI; no nibble carry:
    7 + 7 < 16).  Caller mode diffs full nibbles (GG = W is its own run
    category) with the standard 4-op nonzero chain."""
    j = pl.program_id(1)
    cw = c_ref[:]
    HI = jnp.int32(_HI4)
    M7 = jnp.int32(_M7_4)
    M1 = jnp.int32(_M1_4)

    def lsr(x, k):
        return jax.lax.shift_right_logical(x, jnp.int32(k))

    carried = lsr(pltpu.roll(cw, 1, axis=1), 28)
    prevw = (cw << 4) | carried
    diff = cw ^ prevw
    if caller:
        y = (diff & M7) + M7
        rs_hi = (y | diff) & HI
    else:
        dm = diff & M7
        rs_hi = (dm + M7) & HI
    r0 = lsr(rs_hi, 3)
    m1 = cw & M1
    m2 = lsr(cw, 1) & M1
    m4 = lsr(cw, 2) & M1
    m8 = lsr(cw, 3) & M1

    def cnt(m):
        # per-word count (0..8) of set bit-0s accumulated into the top
        # nibble
        return lsr(m * M1, 28)

    i32 = jnp.int32
    f0 = cnt(m1) + (cnt(m8) << 16)
    f1 = cnt(m2) + (cnt(m4) << 16)
    f2 = cnt(m2 & r0) + (cnt(m4 & r0) << 16)
    f3 = cnt(r0)
    s0 = jnp.sum(f0, axis=1, dtype=i32)
    s1 = jnp.sum(f1, axis=1, dtype=i32)
    s2 = jnp.sum(f2, axis=1, dtype=i32)
    s3 = jnp.sum(f3, axis=1, dtype=i32)
    mask = jnp.int32(0xFFFF)
    s_eqg = s0 & mask  # EQ + GG (bit 0 of both)
    s_gg = (s0 >> 16) & mask
    s_i = s1 & mask
    s_d = (s1 >> 16) & mask
    LW = cw.shape[1]
    # column partition: ext eq(incl gg) + i + d + x = 8*LW; caller
    # eq(excl) + gg + i + d + x = 8*LW and s_eqg = eq + gg -- same formula
    s_x = jnp.int32(8 * LW) - s_eqg - s_i - s_d
    s_eq = s_eqg - s_gg if caller else s_eqg
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
    first_c = cw[:, 0:1] & jnp.int32(0xF)
    last_c = lsr(cw[:, LW - 1 : LW], 28)
    pad_lanes = jnp.zeros((cw.shape[0], 126), jnp.int32)
    edge_ref[:] = jnp.concatenate(
        [
            _cat_to_std(first_c, caller),
            _cat_to_std(last_c, caller),
            pad_lanes,
        ],
        axis=1,
    )


def _cat_to_std(c, caller):
    """One-hot cat nibble -> standard EQ/X/I/D/W codes for _finish_stats.
    Ext mode folds GG into EQ first (bit-3 mask) -- gap/gap merges into
    '=' runs, so tile-edge comparisons must see them as equal."""
    if not caller:
        c = c & jnp.int32(7)
    return jnp.where(
        c == CAT_EQ,
        jnp.int32(EQ),
        jnp.where(
            c == CAT_I,
            jnp.int32(I),
            jnp.where(
                c == CAT_D,
                jnp.int32(D),
                jnp.where(c == CAT_GG, jnp.int32(W), jnp.int32(X)),
            ),
        ),
    )


@functools.partial(
    jax.jit, static_argnames=("tile_b", "tile_lw", "interpret", "caller")
)
def classify_stat_pallas_cat(
    cw, lengths, tile_b=64, tile_lw=4096, interpret=False, caller=False
):
    """Category-plane Pallas kernel.  cw: int32 [B, L//8] from
    pack_cat_nibbles (8 columns per lane, one-hot codes); lengths: int32
    [B] in COLUMNS.  Identical output to classify_stat_jnp on the
    original byte planes (tested) in BOTH modes from the SAME plane.

    Padding contract: columns >= lengths[b] pack to GG=9 (the '-'/'-'
    pack_pairs padding through the LUT), which the _finish_stats
    corrections account for exactly.  tile_lw*8 must stay < 2^16 for the
    packed 16-bit counter fields.
    """
    B, LW = cw.shape
    tile_b = min(tile_b, B)
    tile_b = ((tile_b + 7) // 8) * 8  # sublane-aligned row blocks
    # lane-dim blocks must stay >= 128 (Mosaic (8,128) alignment):
    # a small trailing flush batch pads up instead of shrinking the tile
    tile_lw = min(tile_lw, max(LW, 128))
    assert tile_lw * 8 < (1 << 16), "tile_lw*8 must be < 2^16"
    ggw = jnp.int32(_GGW32)
    if LW % tile_lw:
        LW2 = ((LW + tile_lw - 1) // tile_lw) * tile_lw
        cw = jnp.pad(cw, ((0, 0), (0, LW2 - LW)), constant_values=ggw)
        LW = LW2
    if B % tile_b:
        B2 = ((B + tile_b - 1) // tile_b) * tile_b
        cw = jnp.pad(cw, ((0, B2 - B), (0, 0)), constant_values=ggw)
        lengths = jnp.pad(lengths, (0, B2 - B))
        pad_rows = B2 - B
        B = B2
    else:
        pad_rows = 0
    L = 8 * LW
    nb = pl.cdiv(B, tile_b)
    nl = pl.cdiv(LW, tile_lw)

    out, edges = pl.pallas_call(
        functools.partial(_kernel_cat, caller=caller),
        grid=(nb, nl),
        in_specs=[
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
        cost_estimate=pl.CostEstimate(
            flops=9 * B * LW, bytes_accessed=4 * B * LW + 4 * B * N_STATS,
            transcendentals=0,
        ),
    )(cw)

    last_real_cat = _cat_last_real(cw, lengths, caller)
    return _finish_stats(
        out, edges, nl, L, lengths, last_real_cat, caller, pad_rows
    )


def _cat_last_real(cw, lengths, caller):
    """Standard-coded category of each row's last real column, extracted
    from the cat plane."""
    last_idx = jnp.maximum(lengths - 1, 0)
    widx = last_idx // 8
    shift = ((last_idx % 8) * 4).astype(jnp.int32)
    wv = jnp.take_along_axis(cw, widx[:, None], axis=1)[:, 0]
    c = jax.lax.shift_right_logical(wv, shift) & jnp.int32(0xF)
    return _cat_to_std(c, caller)


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def column_stats(t, q, lengths, use_pallas=None, caller=False):
    """Dispatch: Pallas on TPU, jnp elsewhere.  Arrays may be numpy.

    Host numpy byte inputs take the CATEGORY-plane kernel (round 5: the
    host LUT classifies each column pair into one 4-bit one-hot code --
    half the nibble form's transfer and ~40% fewer kernel vreg-ops, no
    dictionary restriction, scripts/ab_cat.py); device-resident byte
    tensors keep the byte kernel (re-packing would cost a host round
    trip)."""
    # int32 counter bound: per-record counts are <= the padded row width,
    # so rows below 2^31 columns cannot wrap the int32 counters.  Wider
    # rows (4 GB-per-plane records) must take the int64 host engine --
    # batching callers guard via ops.batch.INT32_SAFE_COLUMNS; this
    # assert makes a silent divergence from the u64 reference semantics
    # (cigar.rs:629-707) structurally impossible.
    assert t.shape[1] < 2**31, "row width would wrap int32 stats counters"
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if (
        use_pallas
        and jax.default_backend() == "tpu"
        and isinstance(t, np.ndarray)
        and isinstance(q, np.ndarray)
        and t.dtype == np.uint8
        and q.dtype == np.uint8
        and t.flags.c_contiguous
        and q.flags.c_contiguous
        and t.shape[1] % 4 == 0
    ):
        lengths = jnp.asarray(lengths, dtype=jnp.int32)
        cw = pack_cat_nibbles(t, q)
        if cw is not None:
            return classify_stat_pallas_cat(
                jnp.asarray(cw), lengths, caller=caller
            )
        tw = jnp.asarray(t.view("<i4"))
        qw = jnp.asarray(q.view("<i4"))
        return classify_stat_pallas_words(tw, qw, lengths, caller=caller)
    t = jnp.asarray(t, dtype=jnp.uint8)
    q = jnp.asarray(q, dtype=jnp.uint8)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    if use_pallas:
        return classify_stat_pallas(t, q, lengths, caller=caller)
    return classify_stat_jnp(t, q, lengths, caller=caller)


def pack_pairs(pairs, align=128):
    """Pack a list of (t_bytes, q_bytes) into padded [B, L] uint8 arrays.

    Padding bytes are '-' in BOTH rows so padded columns classify as '='
    and gap/gap -- the contract classify_stat_pallas's padding corrections
    rely on.  Mismatched pair lengths (malformed records) truncate to the
    SHORTER row, matching the host engines' reference zip semantics
    (core.cigar._zip_trunc; host/device byte parity).  Returns
    (t, q, lengths) numpy arrays.
    """
    B = len(pairs)
    L = max((min(len(t), len(q)) for t, q in pairs), default=0)
    L = max(((L + align - 1) // align) * align, align)
    t_arr = np.full((B, L), GAP, dtype=np.uint8)
    q_arr = np.full((B, L), GAP, dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    for k, (t, q) in enumerate(pairs):
        n = min(len(t), len(q))
        lengths[k] = n
        t_arr[k, :n] = np.frombuffer(t, dtype=np.uint8)[:n]
        q_arr[k, :n] = np.frombuffer(q, dtype=np.uint8)[:n]
    return t_arr, q_arr, lengths
