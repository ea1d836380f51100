"""Per-base PAF coverage (reference: src/tools/pafcov.rs).

The reference increments a per-chromosome counter vector over M/'=' CIGAR
spans per record and merges worker maps elementwise.  Here the increments are
an interval scatter-add over (start, end) span tables -- the exact shape of
the device kernel in wgatools_tpu.ops.coverage, with a psum merge across
shards in the distributed path.
"""

import numpy as np

from ..core import cigar as C


def coverage_spans(ops, lens, start: int):
    """M/'=' spans as (starts, ends) advancing like update_cov_vec
    (reference: cigar.rs:710-741): I/S don't advance, everything else does."""
    ops = np.asarray(ops)
    lens = np.asarray(lens, dtype=np.int64)
    advances = np.where((ops == C.OP_I) | (ops == C.OP_S), 0, lens)
    pos = start + np.concatenate(([0], np.cumsum(advances)[:-1]))
    cover = (ops == C.OP_M) | (ops == C.OP_EQ)
    return pos[cover], pos[cover] + lens[cover]


def add_spans(cov: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Difference-array scatter-add: +1 at span starts, -1 at span ends,
    prefix-sum at the end turns it into per-base coverage."""
    n = cov.shape[0]
    starts = np.clip(starts, 0, n)
    ends = np.clip(ends, 0, n)
    np.add.at(cov, starts[starts < n], 1)
    np.subtract.at(cov, ends[ends < n], 1)


def accumulate_record(rec, diff_map, use_native=None):
    """One record's +/-1 coverage scatter into its target's difference
    array (shared by the serial, pooled, and distributed paths).  Hot
    path: one fused native call over the CIGAR text; numpy span tables
    otherwise."""
    from .. import native
    from ..core.cigar import raise_tokenize_error, strip_cg_prefix

    if use_native is None:
        use_native = native.available()
    cov = diff_map.get(rec.target_name)
    if cov is None:
        # int32 halves the footprint vs the reference's usize vectors
        cov = np.zeros(rec.target_length + 1, dtype=np.int32)
        diff_map[rec.target_name] = cov
    if use_native:
        raw = strip_cg_prefix(rec.get_cigar_string()).encode("ascii")
        try:
            if native.cigar_cov_diff(raw, rec.target_start, cov):
                return
        except ValueError as e:
            raise_tokenize_error(raw, e.args[0])
    ops, lens = rec.get_cigar_ops()
    starts, ends = coverage_spans(ops, lens, rec.target_start)
    add_spans(cov[:-1], starts, ends)


def pafcov(reader, writer, device=None):
    """reference: pafcov.rs:13-61.  Output: one BED line per base.

    device=None auto-selects the batched device scatter-add path on TPU
    backends (wgatools_tpu.ops.liftover); host and device paths are
    byte-identical (tested)."""
    from ..core.device import device_requested

    if device_requested(device):
        return _pafcov_device(reader, writer)
    from .. import native

    use_native = native.available()
    diff_map = {}
    for rec in reader.records():
        accumulate_record(rec, diff_map, use_native)
    for target, diff in diff_map.items():
        counts = np.cumsum(diff[:-1])
        write_per_base_bed(writer, target, counts)
    writer.flush()


def _pafcov_device(reader, writer, batch_ops=1 << 20):
    """Device coverage: liftover_scan derives M/'=' spans from padded op
    batches, a donated difference array accumulates scatter-adds per
    target, one prefix sum at the end (ops/liftover.py).

    Streaming: records buffer per target and flush in op-count batches --
    the whole file is never materialized.  Falls back to the int64 host
    path for records whose op-length totals approach 2^31.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from ..ops.liftover import coverage_span_table, pack_ops_batch

    @functools.partial(
        jax.jit, donate_argnums=(0,), static_argnames=("wide",)
    )
    def scatter_batch(diff, ops, lens, t_starts, wide=False):
        starts, ends = coverage_span_table(ops, lens, t_starts, wide=wide)
        n = diff.shape[0] - 1
        valid = (starts.ravel() >= 0).astype(jnp.int32)
        s = jnp.clip(starts.ravel(), 0, n)
        e = jnp.clip(ends.ravel(), 0, n)
        diff = diff.at[s].add(valid)
        diff = diff.at[e].add(-valid)
        return diff

    diff_dev = {}  # target -> device int32 [len+1]
    host_diff = {}  # int64-overflow fallback records
    pending = {}  # target -> (op_arrays, len_arrays, starts, total_ops)
    order = []  # first-appearance target order (= serial output order)

    def flush(target):
        op_arrays, len_arrays, starts, _ = pending.pop(target)
        ops, lens = pack_ops_batch(op_arrays, len_arrays)
        # op lengths >= 2^16 need the 4-limb exact scan
        # (ops/liftover.py cumsum_last)
        wide = any(
            a.max(initial=0) >= 1 << 16 for a in len_arrays
        )
        diff_dev[target] = scatter_batch(
            diff_dev[target],
            jnp.asarray(ops),
            jnp.asarray(lens),
            jnp.asarray(np.array(starts, dtype=np.int32)),
            wide=wide,
        )

    for rec in reader.records():
        ops, lens = rec.get_cigar_ops()
        target = rec.target_name
        if target not in diff_dev and target not in host_diff:
            order.append(target)
            if rec.target_length + 1 >= 2**31:
                host_diff[target] = np.zeros(
                    rec.target_length + 1, dtype=np.int64
                )
            else:
                diff_dev[target] = jnp.zeros(
                    rec.target_length + 1, dtype=jnp.int32
                )
        if target in host_diff or lens.sum(dtype=np.int64) >= 2**31:
            cov = host_diff.setdefault(
                target, np.zeros(rec.target_length + 1, dtype=np.int64)
            )
            starts, ends = coverage_spans(ops, lens, rec.target_start)
            add_spans(cov[:-1], starts, ends)
            continue
        bucket = pending.setdefault(target, ([], [], [], 0))
        bucket[0].append(ops)
        bucket[1].append(lens.astype(np.int32))
        bucket[2].append(rec.target_start)
        total = bucket[3] + len(ops)
        pending[target] = (bucket[0], bucket[1], bucket[2], total)
        if total >= batch_ops:
            flush(target)
    for target in list(pending):
        flush(target)

    for target in order:
        if target in diff_dev:
            counts = np.asarray(jnp.cumsum(diff_dev.pop(target)[:-1]))
            if target in host_diff:
                counts = counts + np.cumsum(host_diff.pop(target)[:-1])
        else:
            counts = np.cumsum(host_diff.pop(target)[:-1])
        write_per_base_bed(writer, target, counts)
    writer.flush()


def write_per_base_bed(writer, target: str, counts: np.ndarray,
                       chunk: int = 1 << 20):
    """Bulk-format one BED line per base: `target\\tpos\\tpos+1\\tcount`.

    Per-base output over whole chromosomes is the pafcov output bottleneck;
    the C++ formatter does ~2 GB/min vs ~2.7 us/line in Python."""
    from .. import native

    prefix = target.encode("ascii")
    n = counts.shape[0]
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        block = native.format_bed_lines(prefix, lo, counts[lo:hi])
        if block is None:
            buf = bytearray()
            for p, c in zip(range(lo, hi), counts[lo:hi].tolist()):
                buf += b"%s\t%d\t%d\t%d\n" % (prefix, p, p + 1, c)
            block = bytes(buf)
        writer.write(block)
