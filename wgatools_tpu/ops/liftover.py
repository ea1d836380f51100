"""Device liftover scan: CIGAR ops -> per-op alignment coordinates.

The coordinate state machines the reference threads through every workload
(chain emission cigar.rs:251-295, coverage update_cov_vec cigar.rs:710-741,
plotdata walks cigar.rs:807-985, validate end-derivation validate.rs:71-120)
are all prefix sums of per-op advances:

    target position advances on everything except I/S (cigar.rs:718-726),
    query  position advances on everything except D.

(The scans implement exactly these complements.  The reference never
feeds N/H/P into a query-side scan -- its folds error on them
(cigar.rs:685) -- and neither do ours: the 16-bit packers reject ops
outside M/=/X/I/D/S, and the raw-op consumers (pafcov span tables,
chain emission) either use only the target side, whose
everything-but-I/S advance matches update_cov_vec for ANY op byte, or
validate the op domain first.  A caller that scanned raw N/H ops would
advance the query side; reject them first.)

A padded [B, N] op/len batch turns both into one `cumsum` along the op
axis -- the `liftover_scan` kernel of SURVEY.md §7.  Offsets accumulate in
int32 (per-record totals are guarded by callers; chromosome-scale
coordinates fit int32).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OP_M = ord("M")
OP_EQ = ord("=")
OP_X = ord("X")
OP_I = ord("I")
OP_D = ord("D")
OP_S = ord("S")


# ---------------------------------------------------------------------------
# Row-wise prefix sum.  XLA's native cumsum lowers poorly on TPU for long
# rows (~6-7 Gelem/s measured on v5e); a blocked triangular matmul rides
# the MXU instead (~2-4x, same-process A/B 2026-08-17; T=256 beat 128/512).
#
# Exactness by construction: the int32 inputs decompose into 8-bit limbs,
# each limb rides the MXU as bf16 x bf16 -> f32 (limb values <= 255 are
# bf16-exact; within-block partial sums <= 256*255 are f32-exact), and the
# shifted limb results recombine in int32.  f32 matmuls are NOT used --
# XLA:TPU lowers those to truncating bf16 passes at default precision.
# wide=False uses 2 limbs (every op length < 2^16); wide=True uses 4
# (any non-negative int32).  Cross-block offsets accumulate in int32.
# ---------------------------------------------------------------------------


def _cumsum_mm_body(xb_int, T, limbs):
    tri = jnp.tril(jnp.ones((T, T), jnp.bfloat16))
    within = None
    for k in range(limbs):
        limb = ((xb_int >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
        w = jax.lax.dot_general(
            limb,
            tri,
            (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32) << (8 * k)
        within = w if within is None else within + w
    block_tot = within[..., -1]
    offs = jnp.cumsum(block_tot, axis=1) - block_tot
    return within + offs[..., None]


@functools.partial(jax.jit, static_argnames=("T", "wide"))
def _cumsum_mm(x, T=256, wide=False):
    B, N = x.shape
    n_pad = (-N) % T
    if n_pad:
        x = jnp.pad(x, ((0, 0), (0, n_pad)))
    nb = x.shape[1] // T
    out = _cumsum_mm_body(x.reshape(B, nb, T), T, 4 if wide else 2)
    return out.reshape(B, nb * T)[:, :N]


def cumsum_last(x, T=256, wide=False, use_mm=None):
    """Inclusive cumsum along the last axis; MXU matmul path on TPU.

    wide=True is required for exactness when any element reaches 2^16
    (callers know their max op length); totals must stay below 2^31
    either way (callers guard, falling back to int64 host paths)."""
    if use_mm is None:
        use_mm = jax.default_backend() == "tpu"
    if not use_mm:
        return jnp.cumsum(x, axis=1)
    return _cumsum_mm(x, T=T, wide=wide)


# ---------------------------------------------------------------------------
# Fused Pallas liftover kernel: advance-select + exclusive prefix sum in one
# VMEM pass.  The jnp formulation above moves every intermediate (advance
# arrays, limb tensors, concatenated halves) through HBM; the kernel reads
# ops/lens once, runs the per-tile triangular matmuls on the MXU from VMEM,
# and carries cross-tile row offsets in a scratch accumulator across the
# sequential column grid.  Mosaic v5e notes: byte comparisons via
# xor-widen-compare, no i1 broadcasts (int32 where/select only), and the
# 2-limb bf16 decomposition keeps the matmuls exact for op lengths < 2^16
# (the `wide` path stays on the jnp/mm formulation).
# ---------------------------------------------------------------------------


def _hillis_scan_pair(adv_t, adv_q, carry):
    """EXCLUSIVE scans of both advance tiles as one pure-VPU
    Hillis-Steele ladder: log2(TLO) shift+add steps on int32 (exact --
    no bf16 limbs, reshapes, or MXU; beat every matmul formulation once
    the classify stage stopped hiding the scan,
    scripts/ab_fused_diag.py round 3)."""
    i32 = jnp.int32
    TB, TLO = adv_t.shape
    both = jnp.concatenate([adv_t, adv_q], axis=0)
    x = both
    k = 1
    while k < TLO:
        shifted = jnp.concatenate(
            [jnp.zeros((2 * TB, k), i32), x[:, :-k]], axis=1
        )
        x = x + shifted
        k *= 2
    ex = x - both
    ex_t = ex[:TB] + carry[:, 0:1]
    ex_q = ex[TB:] + carry[:, 1:2]
    return ex_t, ex_q


def _pair_prefix_mm(a_t, a_q, tri, chunk=None):
    """EXCLUSIVE prefix sums of two int32 advance streams as ONE stacked
    bf16 2-limb triangle matmul (both streams x both limbs stacked along
    the row axis for full MXU row utilization -- the 1.5x trick of
    scripts/ab_liftover.py), with an optional two-level chunk recombine.

    a_t/a_q: int32 [TB, L], per-element advances, each < 2^16 (the
    2-limb bound: per-limb partial sums stay < 2^24, exact in f32).
    tri: strictly-lower-triangular ones as bf16, [L, L] (or [c, c] when
    chunk=c divides L: chunks scan independently, then an unrolled
    prefix over per-chunk totals recombines).  Returns (p_t, p_q) int32
    [TB, L] exclusive prefixes -- NO carry applied; callers add their
    running carry and refresh it from the last column.  Single home of
    the formulation shared by the four scan kernels (round-5 review:
    it had drifted into four hand-maintained copies)."""
    i32 = jnp.int32
    TB, L = a_t.shape
    c = chunk or L
    ns = L // c
    at = a_t.reshape(TB * ns, c)
    aq = a_q.reshape(TB * ns, c)
    # values are < 2^16 and non-negative, so >> 8 == logical shift
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
        stacked,
        tri,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(i32)
    R = TB * ns
    p_t = s[:R] + (s[R : 2 * R] << 8)
    p_q = s[2 * R : 3 * R] + (s[3 * R :] << 8)
    if ns > 1:
        tot_t = (p_t[:, c - 1 : c] + at[:, c - 1 : c]).reshape(TB, ns)
        tot_q = (p_q[:, c - 1 : c] + aq[:, c - 1 : c]).reshape(TB, ns)
        offs_t = [jnp.zeros((TB, 1), i32)]
        offs_q = [jnp.zeros((TB, 1), i32)]
        for k in range(1, ns):
            offs_t.append(offs_t[-1] + tot_t[:, k - 1 : k])
            offs_q.append(offs_q[-1] + tot_q[:, k - 1 : k])
        off_t = jnp.concatenate(offs_t, axis=1)
        off_q = jnp.concatenate(offs_q, axis=1)
        p_t = (p_t.reshape(TB, ns, c) + off_t[:, :, None]).reshape(TB, L)
        p_q = (p_q.reshape(TB, ns, c) + off_q[:, :, None]).reshape(TB, L)
    else:
        p_t = p_t.reshape(TB, L)
        p_q = p_q.reshape(TB, L)
    return p_t, p_q


def _liftover_kernel(
    ops_ref, lens_ref, tri_ref, t_ref, q_ref, carry_ref, *, mode="liftover",
    scan_mode="mm",
):
    j = pl.program_id(1)
    ops = ops_ref[:]
    lens = lens_ref[:]
    i32 = jnp.int32
    pad = ops.astype(i32) == 0
    is_i = (ops ^ jnp.uint8(OP_I)).astype(i32) == 0
    is_s = (ops ^ jnp.uint8(OP_S)).astype(i32) == 0
    is_d = (ops ^ jnp.uint8(OP_D)).astype(i32) == 0
    if mode == "chain":
        # chain data-line derivation scans I-sizes and D-sizes themselves
        # (cigar_unit_chain's target_diff/query_diff, cigar.rs:460-490)
        adv_t = jnp.where(is_i, lens, 0)
        adv_q = jnp.where(is_d, lens, 0)
    else:
        adv_t = jnp.where(pad | is_i | is_s, 0, lens)
        adv_q = jnp.where(pad | is_d, 0, lens)

    if scan_mode == "vpu":
        TB, TL = adv_t.shape

        @pl.when(j == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        carry = carry_ref[:]
        ex_t, ex_q = _hillis_scan_pair(adv_t, adv_q, carry)
        t_ref[:] = ex_t
        q_ref[:] = ex_q
        carry_ref[:] = jnp.concatenate(
            [
                ex_t[:, TL - 1 : TL] + adv_t[:, TL - 1 : TL],
                ex_q[:, TL - 1 : TL] + adv_q[:, TL - 1 : TL],
            ],
            axis=1,
        )
        return

    # strictly-lower-triangular ones, passed in with a constant block
    # index: it stays VMEM-resident across grid steps instead of being
    # rebuilt per tile (rebuilding TLxTL iotas per tile dominated the
    # tiny matmuls in the first formulation; same-process A/B).
    # _pair_prefix_mm stacks both scans x both limbs into ONE matmul
    # (1.5x, scripts/ab_liftover.py 2026-08-17; an in-kernel reshape
    # two-level scan measured the same, so the simpler form wins)
    TL = lens.shape[1]
    TB = lens.shape[0]
    p_t, p_q = _pair_prefix_mm(adv_t, adv_q, tri_ref[:])

    @pl.when(j == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    carry = carry_ref[:]
    ex_t = p_t + carry[:, 0:1]
    ex_q = p_q + carry[:, 1:2]
    t_ref[:] = ex_t
    q_ref[:] = ex_q
    carry_ref[:] = jnp.concatenate(
        [
            ex_t[:, TL - 1 : TL] + adv_t[:, TL - 1 : TL],
            ex_q[:, TL - 1 : TL] + adv_q[:, TL - 1 : TL],
        ],
        axis=1,
    )


@functools.partial(
    jax.jit,
    static_argnames=("tile_b", "tile_l", "interpret", "mode", "scan_mode"),
)
def liftover_scan_pallas(
    ops, lens, tile_b=32, tile_l=1024, interpret=False, mode="liftover",
    scan_mode="vpu",
):
    """Fused exclusive liftover scan (TPU Pallas).

    ops: uint8 [B, N] (0 = padding); lens: int32 [B, N] with every length
    < 2^16 (callers guard; the wide path uses the jnp/mm formulation).
    Returns (t_off, q_off) int32 [B, N], identical to liftover_scan.

    scan_mode="vpu" (round-3 default) runs the exact int32 Hillis-Steele
    ladder (_hillis_scan_pair) -- the bf16-limb matmul chain's cost was
    its reshapes/converts, not MACs (scripts/ab_fused_diag.py); "mm"
    keeps the round-2 triangle-matmul formulation (tile (32, 512) beat
    (8/32, 256) and the jnp/mm form ~3x in the 2026-08-17 A/Bs).
    """
    B, N = ops.shape
    tile_b = min(tile_b, B)
    # Mosaic blocks must be sublane-aligned: a clamped odd row tile
    # (e.g. B=9 -> tile_b=9) fails remote compile; round up to 8 and
    # let the row padding below cover the difference
    tile_b = ((tile_b + 7) // 8) * 8
    tile_l = min(tile_l, max(N, 128))
    if N % tile_l or N == 0:
        N2 = max(((N + tile_l - 1) // tile_l) * tile_l, tile_l)
        ops = jnp.pad(ops, ((0, 0), (0, N2 - N)))
        lens = jnp.pad(lens, ((0, 0), (0, N2 - N)))
    if B % tile_b:
        B2 = ((B + tile_b - 1) // tile_b) * tile_b
        ops = jnp.pad(ops, ((0, B2 - B), (0, 0)))
        lens = jnp.pad(lens, ((0, B2 - B), (0, 0)))
    Bp, Np = ops.shape
    grid = (Bp // tile_b, Np // tile_l)
    spec = pl.BlockSpec(
        (tile_b, tile_l), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    # the vpu scan never touches the triangle; keep its input tiny
    tri_n = 8 if scan_mode == "vpu" else tile_l
    ir = jax.lax.broadcasted_iota(jnp.int32, (tri_n, tri_n), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (tri_n, tri_n), 1)
    tri = jnp.clip(ir - ic, 0, 1).astype(jnp.bfloat16)
    t_off, q_off = pl.pallas_call(
        functools.partial(_liftover_kernel, mode=mode, scan_mode=scan_mode),
        grid=grid,
        in_specs=[
            spec,
            spec,
            pl.BlockSpec(
                (tri_n, tri_n),
                lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Np), jnp.int32),
            jax.ShapeDtypeStruct((Bp, Np), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_b, 2), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=(4 * Bp * Np * tri_n) if scan_mode != "vpu"
            else 30 * Bp * Np,
            bytes_accessed=13 * Bp * Np,
            transcendentals=0,
        ),
    )(ops, lens.astype(jnp.int32), tri)
    return t_off[:B, :N], q_off[:B, :N]


@functools.partial(jax.jit, static_argnames=("wide", "use_mm"))
def _liftover_scan_impl(ops, lens, wide, use_mm):
    lens = lens.astype(jnp.int32)
    pad = ops == 0
    is_i = ops == OP_I
    is_s = ops == OP_S
    is_d = ops == OP_D
    adv_t = jnp.where(pad | is_i | is_s, 0, lens)
    adv_q = jnp.where(pad | is_d, 0, lens)
    # one fused scan over both advance arrays (half the matmul dispatches)
    both = jnp.concatenate([adv_t, adv_q], axis=0)
    cum = cumsum_last(both, wide=wide, use_mm=use_mm)
    B = ops.shape[0]
    t_off = cum[:B] - adv_t
    q_off = cum[B:] - adv_q
    return t_off, q_off


def liftover_scan(ops, lens, wide=False):
    """Exclusive per-op (target, query) offsets within each record.

    ops: uint8 [B, N] (0 = padding); lens: int32 [B, N] (0 on padding).
    Returns (t_off, q_off) int32 [B, N]: the coordinate offset of each op
    from the record's (target_start, query_start).

    wide=True selects the 4-limb scan; required when any op length
    reaches 2^16 (see cumsum_last).
    """
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and not wide:
        return liftover_scan_pallas(ops, lens)
    return _liftover_scan_impl(ops, lens, bool(wide), on_tpu)


@functools.partial(jax.jit, static_argnames=("wide",))
def coverage_span_table(ops, lens, t_starts, wide=False):
    """Per-op absolute M/'=' coverage spans (update_cov_vec semantics).

    ops/lens: padded [B, N]; t_starts: int32 [B] record target starts.
    Returns (starts, ends) int32 [B, N] with non-covering ops marked -1
    (scatter callers drop them), matching tools.pafcov.coverage_spans.
    """
    lens = lens.astype(jnp.int32)
    t_off, _ = liftover_scan(ops, lens, wide=wide)
    cover = (ops == OP_M) | (ops == OP_EQ)
    starts = t_starts[:, None] + t_off
    ends = starts + lens
    neg = jnp.int32(-1)
    return jnp.where(cover, starts, neg), jnp.where(cover, ends, neg)


@functools.partial(jax.jit, static_argnames=("genome_len",))
def spans_to_coverage(starts, ends, genome_len: int):
    """Flat (start, end) span arrays -> per-base coverage over one target.

    Spans with start < 0 are padding and contribute nothing.  Difference
    array + prefix sum (the device analog of pafcov.rs:29-53's counter
    increments).
    """
    n = genome_len
    valid = (starts.ravel() >= 0).astype(jnp.int32)
    s = jnp.clip(starts.ravel(), 0, n)
    e = jnp.clip(ends.ravel(), 0, n)
    diff = jnp.zeros(n + 1, dtype=jnp.int32)
    diff = diff.at[s].add(valid)
    diff = diff.at[e].add(-valid)
    return jnp.cumsum(diff[:-1])


@functools.partial(jax.jit, static_argnames=("wide", "use_mm"))
def _chain_scan_impl(ops, lens, wide, use_mm):
    lens = lens.astype(jnp.int32)
    ins = jnp.where(ops == OP_I, lens, 0)
    dele = jnp.where(ops == OP_D, lens, 0)
    both = jnp.concatenate([ins, dele], axis=0)
    cum = cumsum_last(both, wide=wide, use_mm=use_mm)
    B = ops.shape[0]
    return cum[:B] - ins, cum[B:] - dele


def chain_scan(ops, lens, wide=False):
    """EXCLUSIVE per-op cumulative (ins, del) sizes for chain-line
    derivation: the device form of the accumulated
    target_diff/query_diff state in cigar_unit_chain (reference:
    cigar.rs:460-490).  Host code gathers these at M-run boundaries to
    emit chain lines without re-scanning the op array
    (core.cigar.chain_line_arrays_from_ops uses the same exclusive
    indices).

    ops: uint8 [B, N] (0 = padding); lens: int32 [B, N].  Same kernel
    family and wide/limb rules as liftover_scan.
    """
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and not wide:
        return liftover_scan_pallas(ops, lens, mode="chain")
    return _chain_scan_impl(ops, lens, bool(wide), on_tpu)


def chain_advance_table(ops, lens, wide=False):
    """INCLUSIVE per-op cumulative (ins, del) sizes (chain_scan + adv).

    Routes through chain_scan, so the exactness rules are identical: the
    TPU Pallas path is exact int32 for any op length; the jnp/mm fallback
    needs wide=True when any length reaches 2^16 (cumsum_last's 2-limb
    bound) -- callers that can see >= 2^16 lengths must pass wide=True.
    """
    ops = jnp.asarray(ops)
    lens = jnp.asarray(lens).astype(jnp.int32)
    ins = jnp.where(ops == OP_I, lens, 0)
    dele = jnp.where(ops == OP_D, lens, 0)
    ex_i, ex_d = chain_scan(ops, lens, wide=wide)
    return ex_i + ins, ex_d + dele


def interleave_halves(even, odd):
    """Zip even/odd half-arrays ([B, N/2] each) back to [B, N] --
    the host-side inverse of the fused16 kernel's split offsets."""
    even = np.asarray(even)
    odd = np.asarray(odd)
    out = np.empty((even.shape[0], even.shape[1] * 2), even.dtype)
    out[:, 0::2] = even
    out[:, 1::2] = odd
    return out


def pack_ops_batch(op_arrays, len_arrays, align=128):
    """Pad per-record (ops, lens) arrays to [B, N] (0-padded)."""
    B = len(op_arrays)
    N = max((len(a) for a in op_arrays), default=0)
    N = max(((N + align - 1) // align) * align, align)
    ops = np.zeros((B, N), dtype=np.uint8)
    lens = np.zeros((B, N), dtype=np.int32)
    for k, (o, l) in enumerate(zip(op_arrays, len_arrays)):
        ops[k, : len(o)] = o
        lens[k, : len(o)] = l
    return ops, lens


def pack_ops_words(ops, lens):
    """Packed op words: (op byte << 24) | len, int32 [B, N].

    One device input stream instead of two (4 instead of 5 bytes per op
    of DMA) for the fused kernel's packed path; requires every length
    < 2^16 (the same bound as the 2-limb scan).  Padding (op 0, len 0)
    packs to 0."""
    ops = np.asarray(ops, dtype=np.uint8)
    lens = np.asarray(lens)
    # explicit raise, not assert: under `python -O` an assert is
    # stripped and an oversized length would silently corrupt the
    # packed word (same hazard _validate_pack16 guards below)
    if lens.max(initial=0) >= (1 << 16):
        raise ValueError("packed op words need len < 2^16")
    return (ops.astype(np.int32) << 24) | lens.astype(np.int32)


# advance classes for the 16-bit packing: the scan only needs which of
# (target, query) an op advances (cigar.rs:718-726), not the op byte
ADV_PAD, ADV_BOTH, ADV_I, ADV_S, ADV_D = 0, 1, 2, 3, 4
_ADV_CLASS = np.zeros(256, dtype=np.int32)
for _b in b"M=X":
    _ADV_CLASS[_b] = ADV_BOTH
_ADV_CLASS[OP_I] = ADV_I
_ADV_CLASS[OP_S] = ADV_S
_ADV_CLASS[OP_D] = ADV_D
# ops the packer accepts: padding plus the classes above.  Anything else
# (N, H, corrupt bytes) must NOT silently pack to class 0 = padding --
# it would advance nothing, diverging from the 32-bit paths; callers
# with such ops stay on pack_ops_words/pack_ops_batch.
_VALID_PACK16 = np.zeros(256, dtype=bool)
_VALID_PACK16[0] = True
for _b in b"M=XIDS":
    _VALID_PACK16[_b] = True


def pack_ops_words16(ops, lens):
    """TWO ops per int32: 3-bit advance class + 13-bit length per half
    ([0:13) len0, [13:16) cls0, [16:29) len1, [29:32) cls1).

    The short-run fast path of the fused kernel: halves both the op DMA
    (2 bytes/op) and the scan-ladder width.  Requires every length
    < 2^13 = 8192 (callers guard and fall back to pack_ops_words; real
    whole-genome run lengths sit far below -- test.maf measures mean 48
    -- with SV outliers routed to the 32-bit path).  ops: uint8 [B, N]
    (0 = padding, packs to class 0); every op byte must be one of
    M/=/X/I/S/D (ValueError otherwise -- an unknown op would silently
    pack to the padding class and advance nothing).  N is padded to
    even.  Returns int32 [B, N//2]."""
    ops, lens = _validate_pack16(ops, lens, "pack_ops_words16", pad_to=2)
    cls = _ADV_CLASS[ops]
    half = (cls << 13) | lens.astype(np.int32)
    return half[:, 0::2] | (half[:, 1::2] << 16)


def pack_ops_adv16(ops, lens):
    """Advance-packed op-pair words: per op PAIR and per direction,
    (adv_even << 14) | (adv_even + adv_odd) -- the even op's advance in
    the high bits and the PAIR SUM in the low 14.

    The decode-free fast path of the fused kernel
    (ops.fused.classify_liftover_fused_adv16): the on-chip A/B
    (scripts/ab_scan_mm.py) showed the packed16 scan's cost is its
    per-word class decode + advance SELECTS, not the scan ladder --
    this packing moves all of that into vectorized host numpy, leaving
    the kernel two shift/mask ops per direction.  Same bounds as
    pack_ops_words16 (every length < 2^13, ops in M/=/X/I/S/D; pair
    sums < 2^14 and words < 2^27, so no sign issues).  Returns
    (wt, wq) int32 [B, N//2]; padding packs to 0."""
    adv_t, adv_q = _host_advances(ops, lens, "pack_ops_adv16", pad_to=2)

    def pack(a):
        even = a[:, 0::2]
        return (even << 14) | (even + a[:, 1::2])

    return pack(adv_t), pack(adv_q)


def _validate_pack16(ops, lens, who, pad_to):
    """Shared guard for every 16-bit op packer: op bytes must be in
    M/=/X/I/S/D (+ 0 padding), lengths < 2^13; N is zero-padded to a
    multiple of `pad_to`.  Returns (ops uint8, lens) padded."""
    ops = np.asarray(ops, dtype=np.uint8)
    lens = np.asarray(lens)
    # explicit raise, not assert: under `python -O` an assert is
    # stripped and an oversized length would silently corrupt the
    # packed adv16/sum words (wrong offsets, no error)
    if lens.max(initial=0) >= (1 << 13):
        raise ValueError(f"{who} needs len < 8192")
    if not _VALID_PACK16[ops].all():
        bad = np.unique(ops[~_VALID_PACK16[ops]])
        raise ValueError(
            f"{who}: unsupported op byte(s) "
            f"{[chr(b) for b in bad]}; only M/=/X/I/S/D pack to advance "
            "classes (use the 32-bit op paths for other ops)"
        )
    N = ops.shape[1]
    if N % pad_to:
        pad = pad_to - N % pad_to
        ops = np.pad(ops, ((0, 0), (0, pad)))
        lens = np.pad(lens, ((0, 0), (0, pad)))
    return ops, lens


def _host_advances(ops, lens, who, pad_to):
    """Shared host-side advance decode for the 16-bit packers: the
    single source of the class->advance mapping that pack_ops_adv16
    words and pack_ops_sums anchors are later recombined under
    (expand_group_prefix), so the two packings cannot drift."""
    ops, lens = _validate_pack16(ops, lens, who, pad_to)
    cls = _ADV_CLASS[ops]
    lens = lens.astype(np.int32)
    adv_t = np.where((cls == ADV_BOTH) | (cls == ADV_D), lens, 0)
    adv_q = np.where(
        (cls == ADV_BOTH) | (cls == ADV_I) | (cls == ADV_S), lens, 0
    )
    return adv_t, adv_q


def pack_ops_sums(ops, lens, group=4):
    """Raw GROUP-SUM op words: one int32 per `group` consecutive ops and
    per direction, holding the group's total advance.  The coarsest
    device packing: the fused kernel scans group sums and returns
    group-prefix ANCHORS; consumers reconstruct every op's offset with
    <= group-1 adds from the pair words (pack_ops_adv16) they already
    hold -- vectorized host-side by expand_group_prefix, or inline for
    free in sequential op walks (the reference's own loop accumulates
    per op from offset 0, cigar.rs:251-295; anchors every `group` ops
    strictly improve random access).  Bounds: group even, group*8191 <
    2^16 (so group <= 8 -- keeps the 2-limb bf16 MXU scan exact), same
    op-byte domain as pack_ops_adv16.  Returns (st, sq) int32
    [B, ceil(N/group)]; padding sums to 0."""
    assert group in (2, 4, 8), group
    adv_t, adv_q = _host_advances(ops, lens, "pack_ops_sums", pad_to=group)
    B, N = adv_t.shape
    st = adv_t.reshape(B, N // group, group).sum(axis=2, dtype=np.int32)
    sq = adv_q.reshape(B, N // group, group).sum(axis=2, dtype=np.int32)
    return st, sq


def expand_group_prefix(anchors, w16, group=4):
    """Per-PAIR exclusive prefixes from group anchors + the adv16 pair
    words: P[p] = anchors[p // (group/2)] + (exclusive sum of pair sums
    within the group).  anchors: [B, N2/(group/2)] from the fused
    kernel over pack_ops_sums words; w16: [B, N2] from pack_ops_adv16
    (same direction).  Returns int32 [B, N2] -- identical to the
    kernel's even outputs at group=2 (tested); odd offsets then come
    from adv16_odd_offsets."""
    h = group // 2
    anchors = np.asarray(anchors)
    w16 = np.asarray(w16)
    B, N2 = w16.shape
    if h == 1:
        return anchors[:, :N2].astype(np.int32, copy=False)
    ng = (N2 + h - 1) // h
    ps = np.zeros((B, ng * h), np.int32)
    ps[:, :N2] = w16 & 0x3FFF
    ps = ps.reshape(B, ng, h)
    exc = np.cumsum(ps, axis=2, dtype=np.int32) - ps
    out = anchors[:, :ng, None] + exc
    return out.reshape(B, ng * h)[:, :N2]


def adv16_odd_offsets(even, w):
    """Odd-position liftover offsets from the even ones plus the adv
    words the caller packed (pack_ops_adv16): odd = even + (w >> 14).
    Consumers walking ops derive this for free inline; the fused kernel
    with emit_odd=False skips storing them (half the offset-output
    DMA).  Works on numpy or jnp arrays."""
    return even + (w >> 14)
