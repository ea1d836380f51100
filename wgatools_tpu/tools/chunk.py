"""Split MAF records into fixed column windows (reference: src/tools/chunk.rs).

The genome-axis chunking primitive: each record is cut into windows of
`length` alignment columns; per-s-line starts advance by the non-gap count of
each emitted window (reference: chunk.rs:62-90).
"""

from ..core.cigar import count_non_gap
from ..errors import WGAError
from ..io.maf import MafRecord, MafSLine, MafWriter


def _emit_window(rec, chunk_start, chunk_end, start_vec):
    new_rec = MafRecord(score=rec.score, slines=[], query_idx=1)
    for i, sline in enumerate(rec.slines):
        new_seq = sline.seq[chunk_start:chunk_end]
        align_size = count_non_gap(new_seq)
        new_rec.slines.append(
            MafSLine(
                mode="s",
                name=sline.name,
                start=start_vec[i],
                align_size=align_size,
                strand=sline.strand,
                size=sline.size,
                seq=new_seq,
            )
        )
        start_vec[i] += align_size
    return new_rec


def chunk_maf(reader, length: int, writer):
    if length == 0:
        raise WGAError("`length` should be greater than 0")
    maf_writer = MafWriter(writer)
    maf_writer.write_header(f"#maf version=1.6 split_length={length}")
    for rec in reader.records():
        block_length = len(rec.slines[0].seq)
        start_vec = [s.start for s in rec.slines]
        chunk_start, chunk_end = 0, length
        while chunk_end < block_length:
            maf_writer.write_record(
                _emit_window(rec, chunk_start, chunk_end, start_vec)
            )
            chunk_start = chunk_end
            chunk_end += length
        maf_writer.write_record(
            _emit_window(rec, chunk_start, block_length, start_vec)
        )
    writer.flush()
