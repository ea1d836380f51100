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


def pafcov(reader, writer):
    """reference: pafcov.rs:13-61.  Output: one BED line per base."""
    diff_map = {}
    for rec in reader.records():
        ops, lens = rec.get_cigar_ops()
        cov = diff_map.get(rec.target_name)
        if cov is None:
            # int32 halves the footprint vs the reference's usize vectors
            cov = np.zeros(rec.target_length + 1, dtype=np.int32)
            diff_map[rec.target_name] = cov
        starts, ends = coverage_spans(ops, lens, rec.target_start)
        add_spans(cov[:-1], starts, ends)
    for target, diff in diff_map.items():
        counts = np.cumsum(diff[:-1])
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
