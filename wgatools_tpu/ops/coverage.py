"""Interval coverage as a device scatter-add (reference: src/tools/pafcov.rs).

The reference's per-base counter loops become a difference-array scatter:
+1 at span starts, -1 at span ends, then an (exclusive) prefix sum -- all
XLA ops, sharded over the genome axis with a psum merge across record
shards in the distributed path.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, donate_argnums=(0,))
def scatter_spans(diff, starts, ends):
    """Accumulate spans into a difference array.  diff: int32 [n+1]."""
    n = diff.shape[0] - 1
    starts = jnp.clip(starts, 0, n)
    ends = jnp.clip(ends, 0, n)
    diff = diff.at[starts].add(1)
    diff = diff.at[ends].add(-1)
    return diff


@jax.jit
def diff_to_coverage(diff):
    """Prefix-sum a difference array into per-base coverage [n]."""
    return jnp.cumsum(diff[:-1])
