"""Region extraction from an indexed MAF (reference: src/tools/mafextra.rs).

Interval lookup is a vectorized overlap scan over the index's interval table
(the reference builds a rust_lapper tree per sequence; our per-name interval
count is small enough that a numpy overlap mask is equivalent and simpler).
"""

import numpy as np

from ..errors import EmptyRecord, EmptyRegion
from ..io.maf import MafWriter
from ..io.regions import parse_region, read_region_file


def get_input_regions(regions, region_file):
    if regions is None and region_file is None:
        raise EmptyRegion()
    out = []
    if regions:
        for r in regions:
            out.append(parse_region(r))
    if region_file:
        from ..io.compression import open_input

        out.extend(read_region_file(open_input(region_file)))
    return out


def maf_extract_idx(regions, region_file, mafreader, mafindex, writer):
    """Extract (sub-)blocks overlapping each region; returns failed regions
    (reference: mafextra.rs:25-199)."""
    input_regions = get_input_regions(regions, region_file)
    maf_writer = MafWriter(writer)
    maf_writer.write_header("#maf version=1.6 cmd=maf_extract")
    failed = []
    for region in input_regions:
        item = mafindex.get(region.name)
        if item is None:
            failed.append(region)
            continue
        ivls = item["ivls"]
        starts = np.array([iv["start"] for iv in ivls], dtype=np.int64)
        ends = np.array([iv["end"] for iv in ivls], dtype=np.int64)
        # rust_lapper find: intervals with start < region.end && end > start
        hits = np.flatnonzero((starts < region.end) & (ends > region.start))
        if hits.size == 0:
            failed.append(region)
            continue
        for h in hits.tolist():
            iv = ivls[h]
            mafreader.seek(iv["offset"])
            rec = mafreader.next_record()
            if rec is None:
                raise EmptyRecord()
            ord_ = rec.get_query_idx_byname(region.name)
            if ord_ is None:
                continue
            b_start, b_end = iv["start"], iv["end"]
            if region.start <= b_start and region.end >= b_end:
                maf_writer.write_record(rec)
                continue
            r_start = max(b_start, region.start)
            r_end = min(b_end, region.end)
            rec.slice_block(r_start, r_end, ord_)
            maf_writer.write_record(rec)
    writer.flush()
    return failed
