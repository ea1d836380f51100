"""Record filtering (reference: src/tools/filter.rs)."""

from ..io.maf import MafWriter
from ..io.paf import PafWriter


def _keep(rec, min_block_size: int, min_query_size: int) -> bool:
    """block_length >= min_block_size and query_length >= min_query_size
    (reference: filter.rs:91-105)."""
    return not (
        rec.target_align_size < min_block_size
        or rec.query_length < min_query_size
    )


def filter_maf(reader, writer, min_block_size: int, min_query_size: int):
    maf_writer = MafWriter(writer)
    maf_writer.write_header(
        f"#maf version=1.6 filter=blocksize>={min_block_size} "
        f"querysize>={min_query_size}"
    )
    for rec in reader.records():
        if _keep(rec, min_block_size, min_query_size):
            maf_writer.write_record(rec)
    writer.flush()


def filter_paf(reader, writer, min_block_size: int, min_query_size: int):
    paf_writer = PafWriter(writer)
    for rec in reader.records():
        if _keep(rec, min_block_size, min_query_size):
            paf_writer.write_record(rec)
    writer.flush()


def filter_chain(reader, writer, min_block_size: int, min_query_size: int):
    """Filter chain records.  Note the reference re-serializes every data
    line through Display, so the bare final size line gains `\\t0\\t0`
    (reference: filter.rs:18-41) -- reproduced."""
    from .. import native

    for rec in reader.records():
        if not _keep(rec, min_block_size, min_query_size):
            continue
        writer.write(rec.header.format().encode("ascii"))
        blob = native.format_chain_lines(rec.sizes, rec.dqs, rec.dts)
        if blob is None:
            blob = "".join(
                f"\n{size}\t{dq}\t{dt}" for size, dq, dt in rec.lines
            ).encode("ascii")
        writer.write(blob)
        writer.write(b"\n\n")
    writer.flush()


def filter_paf_align_pair(reader, writer, min_align_size: int):
    """All-to-all mode: keep records whose (query, target) pair's summed
    target_align_size reaches the threshold (reference: filter.rs:108-160)."""
    align_size_sum = {}
    all_recs = []
    for rec in reader.records():
        key = (rec.query_name, rec.target_name)
        align_size_sum[key] = align_size_sum.get(key, 0) + rec.target_align_size
        all_recs.append(rec)
    paf_writer = PafWriter(writer)
    for rec in all_recs:
        if align_size_sum[(rec.query_name, rec.target_name)] >= min_align_size:
            paf_writer.write_record(rec)
    writer.flush()
