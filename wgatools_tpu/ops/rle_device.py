"""Device run-length extraction for CIGAR-string workloads.

maf2paf's device pipeline (SURVEY.md §3.1): host tokenizes s-lines into
padded [B, L] byte batches, the device classifies columns and extracts RLE
*run boundaries*, and only the run table (row, category, length) returns to
the host for string formatting -- ~8 bytes per run instead of 2 bytes per
column across the link.

The run count comes from the fused stats kernel (STAT_RUNS), host-synced
once and bucketed to a power of two so the extraction jit compiles a
handful of sizes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .classify import (
    STAT_RUNS,
    _cat_to_std,
    _classify,
    _default_interpret,
    _NO_CAT,
    classify_stat_pallas_cat,
    column_stats,
    pack_cat_nibbles,
)


@functools.partial(jax.jit, static_argnames=("size", "caller"))
def _extract_runs(t, q, lengths, size, caller=False):
    B, L = t.shape
    cat = _classify(t, q, caller).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    mask = col < lengths[:, None]
    prev = jnp.concatenate(
        [jnp.full((B, 1), _NO_CAT, jnp.int32), cat[:, :-1]], axis=1
    )
    start = (cat != prev) & mask
    flat_idx = jnp.nonzero(start.reshape(-1), size=size, fill_value=B * L)[0]
    valid = flat_idx < B * L
    safe_idx = jnp.minimum(flat_idx, B * L - 1)
    row = safe_idx // L
    start_col = safe_idx % L
    run_cat = cat.reshape(-1)[safe_idx]
    # run end: the next run's start when it is in the same row, else the
    # row's valid length
    next_idx = jnp.concatenate([safe_idx[1:], jnp.array([B * L - 1])])
    next_valid = jnp.concatenate([valid[1:], jnp.array([False])])
    next_row = next_idx // L
    same = next_valid & (next_row == row)
    end_col = jnp.where(same, next_idx % L, lengths[row])
    run_len = end_col - start_col
    return row, run_cat, run_len, valid


@functools.partial(jax.jit, static_argnames=("size", "caller"))
def _extract_runs_cat(cw, lengths, size, caller=False):
    """Run extraction from the CATEGORY plane (round 5): cw int32
    [B, L//8] one-hot nibble codes from pack_cat_nibbles -- 4x less
    host->device transfer than the two byte tensors, which dominated
    the remote-tunnel wall (docs/SCALING.md).  Codes expand on device
    (repeat + per-position shift, fused by XLA) and run boundaries
    compare bit-3-masked codes in ext mode so gap/gap merges into '='
    runs exactly as _classify would (cigar_cat_ext).

    Returns ONE packed int32 array: (run_cat << 28) | run_len, in
    (row, column) order (requires L < 2^28 -- callers guard).  The host
    already knows the per-row run counts (the stats kernel's STAT_RUNS
    column), so row ids never cross the link and the fetch is 4 bytes
    per run instead of 13 (cat+len+row+valid) -- the run-table download
    was what remained of the maf2paf device wall after the cat-plane
    upload (99 s -> measured in docs/SCALING.md)."""
    B, LW = cw.shape
    L = 8 * LW
    rep = jnp.repeat(cw, 8, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    shift = (col % 8) * 4
    c4 = jax.lax.shift_right_logical(rep, shift) & jnp.int32(0xF)
    # standard codes for the output run table (EQ=0 X=1 I=2 D=3 W=4) --
    # the SAME decode the stats kernel's edge output uses, so the two
    # can never drift
    cat = _cat_to_std(c4, caller)
    mask = col < lengths[:, None]
    prev = jnp.concatenate(
        [jnp.full((B, 1), _NO_CAT, jnp.int32), cat[:, :-1]], axis=1
    )
    start = (cat != prev) & mask
    # jnp.nonzero returns indices in order: all valid entries first
    flat_idx = jnp.nonzero(start.reshape(-1), size=size, fill_value=B * L)[0]
    valid = flat_idx < B * L
    safe_idx = jnp.minimum(flat_idx, B * L - 1)
    row = safe_idx // L
    start_col = safe_idx % L
    run_cat = cat.reshape(-1)[safe_idx]
    next_idx = jnp.concatenate([safe_idx[1:], jnp.array([B * L - 1])])
    next_valid = jnp.concatenate([valid[1:], jnp.array([False])])
    next_row = next_idx // L
    same = next_valid & (next_row == row)
    end_col = jnp.where(same, next_idx % L, lengths[row])
    run_len = end_col - start_col
    return (run_cat << 28) | run_len


def start_runs(t, q, lengths, caller=False):
    """Phase 1 of batch_runs: upload and DISPATCH the stats kernel
    asynchronously.  Returns an opaque state for finish_runs -- between
    the two calls the device computes while the host is free to
    parse/pack the next batch (the double-buffer point of the streaming
    tools, VERDICT r4 #4).

    Host numpy byte batches ride the CATEGORY plane (pack_cat_nibbles):
    ONE 0.5-byte/column upload instead of the 2-byte/column t/q pair --
    the dominant cost on the remote-tunnel data path -- and both the
    stats kernel and the run extraction consume the same buffer.
    Device-resident inputs keep the byte path."""
    if (
        isinstance(t, np.ndarray)
        and isinstance(q, np.ndarray)
        and t.dtype == np.uint8
        and q.dtype == np.uint8
        and t.flags.c_contiguous
        and q.flags.c_contiguous
        and t.shape[1] % 8 == 0
        and t.shape[1] < (1 << 28)  # packed (cat << 28 | len) fetch bound
    ):
        cw = pack_cat_nibbles(t, q)
        if cw is not None:
            from ..core.metrics import METRICS

            METRICS.add_bytes("device_rle", cw.nbytes)
            cw = jnp.asarray(cw)
            lengths = jnp.asarray(lengths, dtype=jnp.int32)
            stats = classify_stat_pallas_cat(
                cw, lengths, interpret=_default_interpret(), caller=caller
            )
            return ("cat", cw, lengths, stats, caller)
    # one upload: the RLE extraction needs the byte tensors on device
    # anyway, so stats reuse THOSE buffers (the word-packed kernel would
    # need a second host->device copy of the same bytes, which costs more
    # than it saves on the remote-tunnel data path)
    if isinstance(t, np.ndarray):
        from ..core.metrics import METRICS

        METRICS.add_bytes("device_rle", t.nbytes + q.nbytes)
    t = jnp.asarray(t, dtype=jnp.uint8)
    q = jnp.asarray(q, dtype=jnp.uint8)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    stats = column_stats(t, q, lengths, caller=caller)  # async dispatch
    return ("bytes", (t, q), lengths, stats, caller)


def finish_runs(state):
    """Phase 2 of batch_runs: sync the stats (sizes the extraction),
    run the extraction kernel, fetch.  Returns numpy
    (row_ids int32, cats int32, lens int32)."""
    kind, data, lengths, stats, caller = state
    stats = np.asarray(stats)
    per_row = stats[:, STAT_RUNS]
    total = int(per_row.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int32)
        return z, z, z
    # bucket the extraction size to powers of two with a generous floor so
    # realistic workloads hit a handful of compiled sizes
    size = max(1 << (total - 1).bit_length(), 1 << 16)
    if kind == "cat":
        packed = _extract_runs_cat(data, lengths, size, caller)
        # fetch only (a bucketed cover of) the valid prefix -- the host
        # knows `total` from the stats, and rows reconstruct from the
        # per-row run counts, so the link moves ~4.5 bytes per run
        # instead of 13.  The slice length quantizes to EIGHTHS of the
        # size bucket: an exact [:total] slice would mint a fresh XLA
        # program (= a 30 s remote compile) per distinct total, which
        # measured 2x SLOWER end-to-end than the unpacked fetch.
        step = max(size // 8, 1 << 13)
        fetch_n = min(size, ((total + step - 1) // step) * step)
        packed = np.asarray(packed[:fetch_n])[:total]
        from ..core.metrics import METRICS

        METRICS.add_bytes("device_rle", fetch_n * 4)
        rows = np.repeat(
            np.arange(per_row.shape[0], dtype=np.int32), per_row
        )
        return (
            rows,
            (packed >> 28).astype(np.int32),
            packed & np.int32(0x0FFFFFFF),
        )
    t, q = data
    row, cat, ln, valid = _extract_runs(t, q, lengths, size, caller)
    valid = np.asarray(valid)
    from ..core.metrics import METRICS

    METRICS.add_bytes("device_rle", 13 * valid.shape[0])
    return (
        np.asarray(row)[valid],
        np.asarray(cat)[valid],
        np.asarray(ln)[valid],
    )


def batch_runs(t, q, lengths, caller=False):
    """Extract all runs of a padded batch, in (row, column) order.

    caller=True uses the caller category table (gap/gap -> W) -- the
    device scan for the variant caller.  Returns numpy
    (row_ids int32, cats int32, lens int32)."""
    return finish_runs(start_runs(t, q, lengths, caller=caller))


def split_run_tables(n_rows, row_ids, cats, lens):
    """Partition a batch_runs/finish_runs result into per-record run
    tables: a list of n_rows (cats uint8, lens int64) pairs in row
    order (row_ids is sorted -- runs come back in (row, column) order).
    Shared by every consumer that fans a batched extraction back out to
    records (convert drain, caller emit_group)."""
    splits = np.searchsorted(row_ids, np.arange(1, n_rows))
    return [
        (v.astype(np.uint8), l.astype(np.int64))
        for v, l in zip(np.split(cats, splits), np.split(lens, splits))
    ]
