"""Alignment statistics (reference: src/tools/stat.rs).

Per-record RecStats come from the columnar CIGAR engine (device batch path:
wgatools_tpu.ops.batch_stats); aggregation merges records keyed by
(ref_name, ref_size, query_name, query_size) exactly like the reference,
then natural-sorts rows by ref_name.
"""

from dataclasses import dataclass

import numpy as np

from ..core.cigar import RecStat
from ..core.fmt import fmt_f32
from ..core.natsort import rank_by_natural

STAT_COLUMNS = (
    "ref_name",
    "ref_size",
    "ref_start",
    "query_name",
    "query_size",
    "query_start",
    "aligned_size",
    "unaligned_size",
    "identity",
    "similarity",
    "matched",
    "mismatched",
    "ins_event",
    "del_event",
    "ins_size",
    "del_size",
    "inv_event",
    "inv_size",
    "inv_ins_event",
    "inv_ins_size",
    "inv_del_event",
    "inv_del_size",
)


@dataclass
class PairStat:
    """One record's stat keyed by its sequence pair (stat.rs:52-58)."""

    ref_name: str
    ref_size: int
    query_name: str
    query_size: int
    ref_start: int
    query_start: int
    rec_stat: RecStat


@dataclass
class Statistic:
    ref_name: str = ""
    ref_size: int = 0
    ref_start: int = 0
    query_name: str = ""
    query_size: int = 0
    query_start: int = 0
    aligned_size: int = 0
    unaligned_size: int = 0
    identity: float = 0.0
    similarity: float = 0.0
    matched: int = 0
    mismatched: int = 0
    ins_event: int = 0
    del_event: int = 0
    ins_size: int = 0
    del_size: int = 0
    inv_event: int = 0
    inv_size: float = 0.0
    inv_ins_event: int = 0
    inv_ins_size: int = 0
    inv_del_event: int = 0
    inv_del_size: int = 0

    def to_row(self) -> str:
        return "\t".join(
            (
                self.ref_name,
                str(self.ref_size),
                str(self.ref_start),
                self.query_name,
                str(self.query_size),
                str(self.query_start),
                str(self.aligned_size),
                str(self.unaligned_size),
                fmt_f32(self.identity),
                fmt_f32(self.similarity),
                str(self.matched),
                str(self.mismatched),
                str(self.ins_event),
                str(self.del_event),
                str(self.ins_size),
                str(self.del_size),
                str(self.inv_event),
                fmt_f32(self.inv_size),
                str(self.inv_ins_event),
                str(self.inv_ins_size),
                str(self.inv_del_event),
                str(self.inv_del_size),
            )
        )


def _stat_from_rec(rec) -> PairStat:
    """stat_rec (reference: stat.rs:226-250)."""
    return PairStat(
        ref_name=rec.target_name,
        ref_size=rec.target_length,
        query_name=rec.query_name,
        query_size=rec.query_length,
        ref_start=rec.target_start,
        query_start=rec.query_start,
        rec_stat=rec.get_stat(),
    )


def _copy_fields(stat: Statistic, rs: RecStat):
    stat.aligned_size = rs.aligned_size
    stat.matched = rs.matched
    stat.mismatched = rs.mismatched
    stat.ins_event = rs.ins_event
    stat.del_event = rs.del_event
    stat.ins_size = rs.ins_size
    stat.del_size = rs.del_size
    stat.inv_ins_event = rs.inv_ins_event
    stat.inv_ins_size = rs.inv_ins_size
    stat.inv_del_event = rs.inv_del_event
    stat.inv_del_size = rs.inv_del_size
    stat.inv_event = rs.inv_event
    stat.inv_size = rs.inv_size


def split_final(pair_stats) -> list:
    """--each mode: one row per record (reference: stat.rs:129-164).
    Note the reference leaves unaligned_size at 0 here."""
    out = []
    for ps in pair_stats:
        stat = Statistic(
            ref_name=ps.ref_name,
            ref_size=ps.ref_size,
            ref_start=ps.ref_start,
            query_name=ps.query_name,
            query_size=ps.query_size,
            query_start=ps.query_start,
        )
        _copy_fields(stat, ps.rec_stat)
        stat.identity = float(
            np.float32(stat.matched) / np.float32(stat.aligned_size)
        )
        stat.similarity = float(
            np.float32(stat.matched + stat.mismatched)
            / np.float32(stat.aligned_size)
        )
        out.append(stat)
    return out


def merge_final(pair_stats) -> list:
    """Default mode: aggregate by pair key with min-start tracking
    (reference: stat.rs:167-223)."""
    grouped = {}
    for ps in pair_stats:
        key = (ps.ref_name, ps.ref_size, ps.query_name, ps.query_size)
        grouped.setdefault(key, []).append(ps)
    out = []
    for (ref_name, ref_size, query_name, query_size), group in grouped.items():
        stat = Statistic(
            ref_name=ref_name,
            ref_size=ref_size,
            ref_start=ref_size,  # init to max, min-tracked below
            query_name=query_name,
            query_size=query_size,
            query_start=query_size,
        )
        for ps in group:
            rs = ps.rec_stat
            stat.aligned_size += rs.aligned_size
            stat.matched += rs.matched
            stat.mismatched += rs.mismatched
            stat.ins_event += rs.ins_event
            stat.del_event += rs.del_event
            stat.ins_size += rs.ins_size
            stat.del_size += rs.del_size
            stat.inv_ins_event += rs.inv_ins_event
            stat.inv_ins_size += rs.inv_ins_size
            stat.inv_del_event += rs.inv_del_event
            stat.inv_del_size += rs.inv_del_size
            stat.inv_event += rs.inv_event
            stat.inv_size = float(
                np.float32(stat.inv_size) + np.float32(rs.inv_size)
            )
            if ps.ref_start < stat.ref_start:
                stat.ref_start = ps.ref_start
            if ps.query_start < stat.query_start:
                stat.query_start = ps.query_start
        stat.unaligned_size = stat.ref_size - stat.aligned_size
        stat.identity = float(
            np.float32(stat.matched) / np.float32(stat.aligned_size)
        )
        stat.similarity = float(
            np.float32(stat.matched + stat.mismatched)
            / np.float32(stat.aligned_size)
        )
        out.append(stat)
    return out


def write_style_result(pair_stats, writer, each: bool):
    final = split_final(pair_stats) if each else merge_final(pair_stats)
    rank = rank_by_natural(s.ref_name for s in final)
    final.sort(key=lambda s: rank[s.ref_name])
    writer.write(("\t".join(STAT_COLUMNS) + "\n").encode("ascii"))
    for stat in final:
        writer.write((stat.to_row() + "\n").encode("ascii"))
    writer.flush()


from ..core.device import DEVICE_MIN_COLUMNS  # noqa: F401
from ..core.device import device_requested as _device_requested  # noqa: F401


def stat_maf(reader, writer, each: bool = False, query_name=None, device=None):
    """MAF statistics (reference: stat.rs:61-84).

    device=None auto-selects the batched device kernel path on TPU
    backends; True/False force it.  Both paths produce identical integers
    (tested) -- the device path batches records through the fused
    classify+stat kernel instead of per-record host RLE.
    """
    if not _device_requested(device):
        pair_stats = []
        for rec in reader.records():
            if query_name is not None:
                rec.set_query_idx_byname(query_name)
            pair_stats.append(_stat_from_rec(rec))
        write_style_result(pair_stats, writer, each)
        return

    from ..ops.batch import stream_seq_pair_stats

    def items():
        for rec in reader.records():
            if query_name is not None:
                rec.set_query_idx_byname(query_name)
            meta = (
                rec.target_name,
                rec.target_length,
                rec.query_name,
                rec.query_length,
                rec.target_start,
                rec.query_start,
            )
            yield (rec.target_seq, rec.query_seq, rec.is_negative, meta)

    # streaming with an auto-mode decision buffer: inputs that end below
    # DEVICE_MIN_COLUMNS take the host engine (device dispatch does not
    # amortize); larger inputs flow through flush-sized device batches
    # without ever materializing the file
    stream = items()
    head = []
    head_cols = 0
    if device is None:
        for item in stream:
            head.append(item)
            head_cols += len(item[0])
            if head_cols >= DEVICE_MIN_COLUMNS:
                break
    if device is None and head_cols < DEVICE_MIN_COLUMNS:
        from ..core.cigar import cigar_from_seqs, rec_stat_from_cigar, seq_bytes

        results = (
            (m, rec_stat_from_cigar(cigar_from_seqs(seq_bytes(t), seq_bytes(q), neg)))
            for t, q, neg, m in head
        )
    else:
        import itertools

        results = stream_seq_pair_stats(itertools.chain(head, stream))
    pair_stats = [
        PairStat(
            ref_name=m[0],
            ref_size=m[1],
            query_name=m[2],
            query_size=m[3],
            ref_start=m[4],
            query_start=m[5],
            rec_stat=rs,
        )
        for m, rs in results
    ]
    write_style_result(pair_stats, writer, each)


def stat_paf(reader, writer, each: bool = False, device=None):
    """PAF statistics (reference: stat.rs:87-105).

    The device path reduces tokenized CIGAR op batches with segment sums
    (wgatools_tpu.ops.segments); parity with the host path is tested."""
    if not _device_requested(device):
        pair_stats = [_stat_from_rec(rec) for rec in reader.records()]
        write_style_result(pair_stats, writer, each)
        return

    from ..tools.validate import stream_batch_stats

    # streaming: records flow through flush-sized device batches; only the
    # small per-pair stat rows accumulate (constant memory in file size)
    pair_stats = [
        PairStat(
            ref_name=rec.target_name,
            ref_size=rec.target_length,
            query_name=rec.query_name,
            query_size=rec.query_length,
            ref_start=rec.target_start,
            query_start=rec.query_start,
            rec_stat=rs,
        )
        for rec, rs in stream_batch_stats(reader.records())
    ]
    write_style_result(pair_stats, writer, each)
