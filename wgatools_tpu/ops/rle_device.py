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

from .classify import STAT_RUNS, _classify, _NO_CAT, column_stats


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


def batch_runs(t, q, lengths, caller=False):
    """Extract all runs of a padded batch, in (row, column) order.

    caller=True uses the caller category table (gap/gap -> W) -- the
    device scan for the variant caller.  Returns numpy
    (row_ids int32, cats int32, lens int32).
    """
    # one upload: the RLE extraction needs the byte tensors on device
    # anyway, so stats reuse THOSE buffers (the word-packed kernel would
    # need a second host->device copy of the same bytes, which costs more
    # than it saves on the remote-tunnel data path)
    t = jnp.asarray(t, dtype=jnp.uint8)
    q = jnp.asarray(q, dtype=jnp.uint8)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    stats = np.asarray(column_stats(t, q, lengths, caller=caller))
    total = int(stats[:, STAT_RUNS].sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int32)
        return z, z, z
    # bucket the extraction size to powers of two with a generous floor so
    # realistic workloads hit a handful of compiled sizes
    size = max(1 << (total - 1).bit_length(), 1 << 16)
    row, cat, ln, valid = _extract_runs(t, q, lengths, size, caller)
    valid = np.asarray(valid)
    return (
        np.asarray(row)[valid],
        np.asarray(cat)[valid],
        np.asarray(ln)[valid],
    )
