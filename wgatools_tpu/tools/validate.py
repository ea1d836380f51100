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


def validate_paf(reader, writer, fix_writer=None, fix_flag=False):
    """reference: validate.rs:44-141."""
    vd = Validations()
    for rec in reader.records():
        vd.total += 1
        rs = rec.get_stat()
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
    writer.write((vd.format() + "\n").encode("ascii"))
    if fix_writer is not None:
        paf_writer = PafWriter(fix_writer)
        for rec in vd.fix_paf_recs:
            paf_writer.write_record(rec)
        fix_writer.flush()
    writer.flush()
    return vd
