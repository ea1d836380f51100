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
                            blocks and cross-tile run-boundary handling via
                            a precomputed boundary-column side input.

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
EQ, X, I, D = 0, 1, 2, 3

# sentinel category for "column before the first": never equal to any real
# category, so run starts at column 0 are always counted
_NO_CAT = 255


def _classify(t, q):
    """ext-mode category codes from byte tensors."""
    eq = t == q
    ti = t == GAP
    qi = q == GAP
    return jnp.where(eq, EQ, jnp.where(ti, I, jnp.where(qi, D, X))).astype(
        jnp.uint8
    )


def _stats_from_cat(cat, prev_cat, mask):
    """Per-record counter reduction over one (tile of a) category array."""
    m = mask
    i32 = jnp.int32
    is_eq = (cat == EQ) & m
    is_x = (cat == X) & m
    is_i = (cat == I) & m
    is_d = (cat == D) & m
    run_start = (cat != prev_cat) & m
    i_start = is_i & (prev_cat != I)
    d_start = is_d & (prev_cat != D)
    return jnp.stack(
        [
            jnp.sum(is_eq, axis=1, dtype=i32),
            jnp.sum(is_x, axis=1, dtype=i32),
            jnp.sum(is_i, axis=1, dtype=i32),
            jnp.sum(is_d, axis=1, dtype=i32),
            jnp.sum(i_start, axis=1, dtype=i32),
            jnp.sum(d_start, axis=1, dtype=i32),
            jnp.zeros(cat.shape[0], dtype=i32),  # gapgap, filled by caller
            jnp.sum(run_start, axis=1, dtype=i32),
        ],
        axis=1,
    )


@jax.jit
def classify_stat_jnp(t, q, lengths):
    """Reference jnp implementation.  t, q: uint8 [B, L]; lengths: int32 [B].

    Returns int32 [B, 8].
    """
    B, L = t.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    mask = col < lengths[:, None]
    cat = _classify(t, q)
    prev_cat = jnp.concatenate(
        [jnp.full((B, 1), _NO_CAT, dtype=jnp.int32), cat[:, :-1].astype(jnp.int32)],
        axis=1,
    )
    stats = _stats_from_cat(cat, prev_cat, mask)
    gapgap = jnp.sum((t == GAP) & (q == GAP) & mask, axis=1, dtype=jnp.int32)
    return stats.at[:, STAT_GAPGAP].set(gapgap)


def _kernel(t_ref, q_ref, prev_t_ref, prev_q_ref, len_ref, out_ref):
    """Pallas kernel body: one (TB, TL) tile; accumulates into [TB, 8]."""
    j = pl.program_id(1)
    tl = t_ref.shape[1]

    t = t_ref[:]
    q = q_ref[:]
    tb = t.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, tl), 1) + j * tl
    mask = col < len_ref[:]
    cat = _classify(t, q).astype(jnp.int32)

    # previous-column categories: shift within the tile; column 0 of the
    # tile uses the precomputed boundary column (or the sentinel for j==0)
    pt = prev_t_ref[:, 0][:, None]
    pq = prev_q_ref[:, 0][:, None]
    boundary_cat = jnp.where(
        j == 0, _NO_CAT, _classify(pt, pq).astype(jnp.int32)
    )
    prev_cat = jnp.concatenate([boundary_cat, cat[:, :-1]], axis=1)

    stats = _stats_from_cat(cat, prev_cat, mask)
    gapgap = jnp.sum((t == GAP) & (q == GAP) & mask, axis=1, dtype=jnp.int32)
    stats = stats.at[:, STAT_GAPGAP].set(gapgap)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += stats


@functools.partial(jax.jit, static_argnames=("tile_b", "tile_l", "interpret"))
def classify_stat_pallas(t, q, lengths, tile_b=8, tile_l=32768, interpret=False):
    """Pallas TPU kernel.  t, q: uint8 [B, L] (L a multiple of tile_l or it
    is padded by the caller); lengths: int32 [B]."""
    B, L = t.shape
    tile_b = min(tile_b, B)
    tile_l = min(tile_l, L)
    nb = pl.cdiv(B, tile_b)
    nl = pl.cdiv(L, tile_l)

    # boundary columns: bytes at the last column of each preceding tile,
    # i.e. prev_t[:, j] = t[:, j*tile_l - 1] (j=0 slot unused)
    idx = jnp.maximum(jnp.arange(nl) * tile_l - 1, 0)
    prev_t = t[:, idx]
    prev_q = q[:, idx]

    grid = (nb, nl)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_b, tile_l), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_b, tile_l), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_b, 1), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_b, 1), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            ],
        out_specs=pl.BlockSpec(
            (tile_b, N_STATS), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N_STATS), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * B * L, bytes_accessed=2 * B * L + 4 * B * N_STATS,
            transcendentals=0,
        ),
    )(t, q, prev_t, prev_q, lengths[:, None].astype(jnp.int32))
    return out


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def column_stats(t, q, lengths, use_pallas=None):
    """Dispatch: Pallas on TPU, jnp elsewhere.  Arrays may be numpy."""
    t = jnp.asarray(t, dtype=jnp.uint8)
    q = jnp.asarray(q, dtype=jnp.uint8)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return classify_stat_pallas(t, q, lengths)
    return classify_stat_jnp(t, q, lengths)


def pack_pairs(pairs, align=128):
    """Pack a list of (t_bytes, q_bytes) into padded [B, L] uint8 arrays.

    Padding bytes are 0 for target and 1 for query so padded columns
    classify as X (harmless: they are masked out anyway, but never
    accidentally equal).
    Returns (t, q, lengths) numpy arrays.
    """
    B = len(pairs)
    L = max((len(t) for t, _ in pairs), default=0)
    L = max(((L + align - 1) // align) * align, align)
    t_arr = np.zeros((B, L), dtype=np.uint8)
    q_arr = np.ones((B, L), dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    for k, (t, q) in enumerate(pairs):
        n = len(t)
        lengths[k] = n
        t_arr[k, :n] = np.frombuffer(t, dtype=np.uint8)
        q_arr[k, :n] = np.frombuffer(q, dtype=np.uint8)
    return t_arr, q_arr, lengths
