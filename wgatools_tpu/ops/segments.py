"""Ragged CIGAR-op batch reductions (device).

PAF-driven workloads (stat -f paf, validate, paf2chain headers) reduce over
tokenized CIGAR op arrays instead of alignment columns.  A batch of records'
ops are concatenated into flat (ops, lens) arrays with a row_id per op; all
per-record statistics become segment sums -- the device analog of
parse_paf_to_cigar's fold (reference: src/parser/cigar.rs:629-707).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

OP_M = ord("M")
OP_EQ = ord("=")
OP_X = ord("X")
OP_I = ord("I")
OP_D = ord("D")

# output columns of cigar_batch_stats
SEG_MATCHED = 0
SEG_MISMATCHED = 1
SEG_INS_SIZE = 2
SEG_DEL_SIZE = 3
SEG_INS_EVENT = 4
SEG_DEL_EVENT = 5
N_SEG_STATS = 6


@functools.partial(jax.jit, static_argnames=("num_records",))
def cigar_batch_stats(ops, lens, row_ids, num_records):
    """Per-record CIGAR stats via segment sums.

    ops: uint8 [N] op codes; lens: int32 [N]; row_ids: int32 [N].
    Returns int32 [num_records, 6] (host aggregation upcasts): matched, mismatched, ins_size, del_size,
    ins_events, del_events.  Every I/D op is one event (PAF semantics).

    CONTRACT: per-record len totals must stay below 2^31 -- the segment
    sums are int32 (the reference accumulates u64, cigar.rs:629-707).
    Dispatching callers guard this and route overflowing records to the
    int64 host engine (tools/validate.py stream_batch_stats; differential
    test tests/test_int32_overflow.py crosses the boundary).
    """
    lens = lens.astype(jnp.int32)
    is_m = (ops == OP_M) | (ops == OP_EQ)
    is_x = ops == OP_X
    is_i = ops == OP_I
    is_d = ops == OP_D

    def seg(vals):
        return jax.ops.segment_sum(vals, row_ids, num_segments=num_records)

    return jnp.stack(
        [
            seg(jnp.where(is_m, lens, 0)),
            seg(jnp.where(is_x, lens, 0)),
            seg(jnp.where(is_i, lens, 0)),
            seg(jnp.where(is_d, lens, 0)),
            seg(is_i.astype(jnp.int32)),
            seg(is_d.astype(jnp.int32)),
        ],
        axis=1,
    )


def assert_stat_ops(ops):
    """Reject ops outside {M,=,X,I,D} with CigarOpInvalid, matching the
    reference's parse_paf_to_cigar fold (cigar.rs:685: any other op --
    S, H, N, P -- is an error on the stat/validate path).  The device
    segment sums would otherwise silently drop the op from every
    counter, diverging from the host engine (round-5 review finding).
    Called per record by streaming consumers so partial output before
    the offending record matches the host engine's."""
    known = (
        (ops == OP_M)
        | (ops == OP_EQ)
        | (ops == OP_X)
        | (ops == OP_I)
        | (ops == OP_D)
    )
    if not known.all():
        from ..errors import CigarOpInvalid

        raise CigarOpInvalid(chr(int(ops[~known][0])))


def pack_cigar_batch(op_arrays, len_arrays):
    """Concatenate per-record (ops, lens) into flat arrays with row ids.

    Op domain enforced via assert_stat_ops (backstop; streaming callers
    check per record first)."""
    if not op_arrays:
        return (
            np.zeros(0, np.uint8),
            np.zeros(0, np.int32),
            np.zeros(0, np.int32),
        )
    ops = np.concatenate(op_arrays)
    lens = np.concatenate(len_arrays)
    assert_stat_ops(ops)
    row_ids = np.repeat(
        np.arange(len(op_arrays), dtype=np.int32),
        [len(a) for a in op_arrays],
    )
    return ops, lens, row_ids
