"""Pseudo-MAF generation from PAF for pangenome divergence analysis
(reference: src/tools/pseudomaf.rs).

Records group by target (one output `<target>.maf` per target), then by
query; each query row is the concatenation of its segments projected onto
the target axis via the CIGAR (real bases, or 1/0/- identity symbols without
FASTA), with '-' fill between segments and head-trim/drop for overlaps.
"""

import os

from ..core import cigar as C
from ..core.strand import Strand
from ..errors import FileReWrite, NotDirError, StdoutNotAllowed
from ..io.fasta import FastaReader


def generate_pseudo_maf(reader, out_dir, fa_path, target, rewrite=False,
                        threads=1, stripe=None):
    """reference: pseudomaf.rs:18-74 + wrapper utils.rs:602-641.

    threads > 1 writes the per-target output files dir-parallel (the
    reference's into_par_iter, pseudomaf.rs:62-72): records are parsed and
    grouped once in the parent, forked children inherit the groups
    copy-on-write and each writes its own <target>.maf.

    stripe=(pid, nproc) claims every nproc-th target (first-appearance
    order, identical in every process) -- the multi-process mode: pure
    file-level parallelism, each <target>.maf written by exactly one
    process, no collectives."""
    if out_dir == "-":
        raise StdoutNotAllowed()
    if not os.path.exists(out_dir):
        os.makedirs(out_dir, exist_ok=True)  # racing processes are fine
    else:
        if not os.path.isdir(out_dir):
            raise NotDirError(out_dir)
        if not rewrite and stripe is None:
            raise FileReWrite(out_dir)
    # in stripe mode a sibling process may have just created the
    # directory, so the overwrite guard moves to the per-target files
    # (each written by exactly one process)

    target_groups = {}
    for rec in reader.records():
        if target is not None and rec.target_name != target:
            continue
        target_groups.setdefault(rec.target_name, []).append(rec)

    def write_one(target_name):
        out_path = os.path.join(out_dir, f"{target_name}.maf")
        if stripe is not None and not rewrite and os.path.exists(out_path):
            raise FileReWrite(out_path)
        with open(out_path, "wb") as writer:
            write_pmaf(writer, target_groups[target_name], target_name, fa_path)

    names = list(target_groups)
    if stripe is not None:
        pid, nproc = stripe
        names = names[pid::nproc]
    if threads > 1 and len(names) > 1:
        from ..parallel.host_pool import forked_map

        # file-level parallelism: children only return None; each output
        # file is written exclusively by one child.  The sliding window
        # bounds live forks at `threads` like the reference's rayon
        # pool (an unbounded fan-out forked one child PER TARGET --
        # round-5 review finding)
        forked_map(write_one, names, limit=threads)
    else:
        for name in names:
            write_one(name)


def _get_seq(fa: FastaReader | None, name, start, end, is_target):
    """reference: pseudomaf.rs:210-237 (inclusive-end faidx quirk)."""
    if fa is not None:
        return fa.fetch(name, start, end - 1)
    if is_target:
        return b"N" * (end - start)
    return b""


def write_pmaf(writer, rec_vec, target_name, fa_path):
    """reference: pseudomaf.rs:77-207."""
    fa = FastaReader(fa_path) if fa_path else None
    true_base = fa_path is not None

    # group by query, insertion-sorted by target_start (pseudomaf.rs:86-95)
    query_groups = {}
    for rec in rec_vec:
        group = query_groups.setdefault(rec.query_name, [])
        lo, hi = 0, len(group)
        while lo < hi:
            mid = (lo + hi) // 2
            if group[mid].target_start < rec.target_start:
                lo = mid + 1
            else:
                hi = mid
        group.insert(lo, rec)

    writer.write(b"a score=0\n")
    first_flag = True
    target_size = 0
    for query_name, group in query_groups.items():
        first_query_flag = True
        last_target_end = 0
        row = bytearray()
        for rec in group:
            target_size = rec.target_length
            if first_flag:
                writer.write(
                    f"s\t{target_name}\t0\t{target_size}\t+\t{target_size}\t".encode()
                )
                writer.write(_get_seq(fa, target_name, 0, target_size, True))
                writer.write(b"\n")
                first_flag = False
            if first_query_flag:
                writer.write(
                    f"s\t{rec.query_name}\t0\t{rec.query_length}\t+\t"
                    f"{rec.query_length}\t".encode()
                )
            overlap_len = 0
            if rec.target_start > last_target_end:
                row += b"-" * (rec.target_start - last_target_end)
            else:
                if last_target_end > rec.target_end:
                    # fully contained in previous segment: drop
                    continue
                overlap_len = last_target_end - rec.target_start
            last_target_end = rec.target_end

            q_seq = _get_seq(fa, query_name, rec.query_start, rec.query_end, False)
            if rec.query_strand == Strand.NEGATIVE:
                q_seq = C.reverse_complement(q_seq)
            ops, lens = rec.get_cigar_ops()
            q_seq = C.pseudo_maf_seq_by_ops(ops, lens, q_seq, true_base)
            if overlap_len > 0:
                q_seq = q_seq[overlap_len:]
            row += q_seq
            first_query_flag = False
        row += b"-" * (target_size - last_target_end)
        writer.write(bytes(row))
        writer.write(b"\n")
    writer.write(b"\n")
