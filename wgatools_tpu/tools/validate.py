"""Validate / fix PAF coordinates against CIGARs (reference: src/tools/validate.rs).

expected query_end = query_start + matched + mismatched + ins (+inv variants)
expected target_end = target_start + matched + mismatched + del (+inv variants)

The per-record stat computation runs through the columnar CIGAR engine (and
the batched device path when many records are validated at once).
"""

from dataclasses import dataclass, field

from ..io.paf import PafWriter


@dataclass
class Validations:
    total: int = 0
    query_invalid: int = 0
    query_inv_list: list = field(default_factory=list)
    ref_invalid: int = 0
    ref_inv_list: list = field(default_factory=list)
    fix_paf_recs: list = field(default_factory=list)

    def format(self) -> str:
        lines = [
            f"Total records: {self.total}",
            f"Query invalid records: {self.query_invalid}",
            f"Target invalid records: {self.ref_invalid}",
            "Query invalid list:",
        ]
        lines.extend(self.query_inv_list)
        lines.append("Target invalid list:")
        lines.extend(self.ref_inv_list)
        return "\n".join(lines) + "\n"


def _stat_from_row(rec, row):
    """Device counter row -> RecStat with host strand routing."""
    from ..core.cigar import Cigar, rec_stat_from_cigar

    c = Cigar()
    c.match_count = int(row[0])
    c.mismatch_count = int(row[1])
    if rec.is_negative:
        c.inv_event = 1
        c.inv_ins_count, c.inv_del_count = int(row[2]), int(row[3])
        c.inv_ins_event, c.inv_del_event = int(row[4]), int(row[5])
    else:
        c.ins_count, c.del_count = int(row[2]), int(row[3])
        c.ins_event, c.del_event = int(row[4]), int(row[5])
    return rec_stat_from_cigar(c)


def stream_batch_stats(records, batch_ops=1 << 20):
    """Yield (record, RecStat) in input order, computing stats in batched
    device segment sums (tokenize native, reduce on device, strand-route
    on host).

    Streaming: only one flush batch of records is held at a time -- the
    input is never materialized (constant memory on arbitrarily large
    PAFs).  Records whose op-length totals approach 2^31 take the int64
    host path individually (device counters are int32).
    """
    import numpy as np

    from ..ops.segments import cigar_batch_stats, pack_cigar_batch

    pending = []  # (rec, ops, lens)
    total = 0

    def flush():
        nonlocal total
        if not pending:
            return
        ops, lens, row_ids = pack_cigar_batch(
            [p[1] for p in pending], [p[2] for p in pending]
        )
        rows = np.asarray(
            cigar_batch_stats(ops, lens, row_ids, len(pending))
        )
        for (rec, _, _), row in zip(pending, rows):
            yield rec, _stat_from_row(rec, row)
        pending.clear()
        total = 0

    from ..ops.segments import assert_stat_ops

    for rec in records:
        ops, lens = rec.get_cigar_ops()
        # per-record op-domain check BEFORE batching: the host engine
        # errors at the offending record having already emitted every
        # earlier one -- flush the good records first so partial output
        # matches (round-5 review finding)
        try:
            assert_stat_ops(ops)
        except Exception:
            yield from flush()
            raise
        if lens.sum(dtype=np.int64) >= 2**31:
            yield from flush()
            yield rec, rec.get_stat()
            continue
        pending.append((rec, ops, lens.astype(np.int32)))
        total += len(ops)
        if total >= batch_ops:
            yield from flush()
    yield from flush()


def _batch_stats(records):
    """Per-record stats on the device (list-in, list-out wrapper around
    stream_batch_stats; parity-tested against the host path)."""
    return [rs for _, rs in stream_batch_stats(records)]


def check_record(rec, rs, vd, fix_flag):
    """Validate one record against its RecStat, updating vd and fixing the
    record's ends in place (loop body of validate.rs:71-120)."""
    vd.total += 1
    exp_query_end = (
        rec.query_start
        + rs.matched
        + rs.mismatched
        + rs.ins_size
        + rs.inv_ins_size
    )
    if exp_query_end != rec.query_end:
        vd.query_invalid += 1
        vd.query_inv_list.append(
            f"{rec.query_name}:{rec.query_start}-{rec.query_end}"
        )
        rec.query_end = exp_query_end
    exp_ref_end = (
        rec.target_start
        + rs.matched
        + rs.mismatched
        + rs.del_size
        + rs.inv_del_size
    )
    if exp_ref_end != rec.target_end:
        vd.ref_invalid += 1
        vd.ref_inv_list.append(
            f"{rec.target_name}:{rec.target_start}-{rec.target_end}"
        )
        rec.target_end = exp_ref_end
    if fix_flag:
        vd.fix_paf_recs.append(rec)


def validate_paf(reader, writer, fix_writer=None, fix_flag=False, device=None):
    """reference: validate.rs:44-141."""
    from .stat import _device_requested

    vd = Validations()
    if _device_requested(device):
        stream = stream_batch_stats(reader.records())
    else:
        stream = ((rec, rec.get_stat()) for rec in reader.records())
    for rec, rs in stream:
        check_record(rec, rs, vd, fix_flag)
    writer.write((vd.format() + "\n").encode("ascii"))
    if fix_writer is not None:
        paf_writer = PafWriter(fix_writer)
        for rec in vd.fix_paf_recs:
            paf_writer.write_record(rec)
        fix_writer.flush()
    writer.flush()
    return vd
