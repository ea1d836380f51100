"""PAF reader/writer (reference: src/parser/paf.rs).

Tab-separated, 12 standard columns plus free-form tags; '#' comment lines and
empty lines are skipped (paf.rs:22-31).  `cg:Z:` CIGAR tags are preferred and
`cs:Z:` tags are converted when only they are present (paf.rs:122-140).
"""

import re
from dataclasses import dataclass, field

from ..core.cigar import (
    Cigar,
    RecStat,
    cigar_stats_from_ops,
    rec_stat_from_cigar,
    strip_cg_prefix,
    tokenize_cigar,
)
from ..core.strand import Strand
from ..errors import (
    CigarOpInvalid,
    CigarTagNotFound,
    ParseIntError,
    ParsePafError,
)


def _parse_u64(s: str, what: str) -> int:
    # Rust u64::from_str grammar: optional leading '+', ASCII digits
    # only (no '1_000'/unicode-digit leniency -- round-5 review finding)
    d = s[1:] if s[:1] == "+" else s
    if not d.isascii() or not d.isdigit():
        if s[:1] == "-":
            raise ParsePafError(f"field `{what}`: `{s}` negative")
        raise ParsePafError(f"field `{what}`: `{s}` not an integer")
    v = int(d)
    if v > 0x7FFFFFFFFFFFFFFF:  # int64 arrays downstream (see PARITY.md)
        raise ParsePafError(f"field `{what}`: `{s}` not an integer")
    return v


@dataclass
class PafRecord:
    query_name: str = ""
    query_length: int = 0
    query_start: int = 0
    query_end: int = 0
    strand: str = Strand.POSITIVE
    target_name: str = ""
    target_length: int = 0
    target_start: int = 0
    target_end: int = 0
    matches: int = 0
    block_length: int = 0
    mapq: int = 0
    tags: list = field(default_factory=list)

    # -- AlignRecord surface (paf.rs:81-152) --

    @property
    def query_strand(self) -> str:
        return self.strand

    @property
    def target_strand(self) -> str:
        return Strand.POSITIVE

    @property
    def target_align_size(self) -> int:
        return self.target_end - self.target_start

    @property
    def is_negative(self) -> bool:
        return self.strand == Strand.NEGATIVE

    def get_cigar_string(self) -> str:
        """cg:Z: tag, else cs:Z: converted to CIGAR (paf.rs:122-140)."""
        cg = next((t for t in self.tags if t.startswith("cg:Z:")), None)
        if cg is not None:
            return cg
        cs = next((t for t in self.tags if t.startswith("cs:Z:")), None)
        if cs is not None:
            return "cg:Z:" + cs_to_cigar(cs[5:])
        raise CigarTagNotFound()

    def get_cigar_ops(self):
        return tokenize_cigar(strip_cg_prefix(self.get_cigar_string()))

    def get_stat(self) -> RecStat:
        """parse_paf_to_cigar stats (reference cigar.rs:629-707).

        Hot path: one fused native scan over the CIGAR text (tokenize +
        stat accumulation); numpy ops path when the library is missing."""
        from .. import native

        # "replace": a corrupt tag byte already decoded to U+FFFD --
        # re-encode it to '?' so it fails downstream as CigarOpInvalid
        # (a clean WGAError), not a UnicodeEncodeError traceback
        # (found by scripts/fuzz_campaign.py prop_parser_robustness)
        raw = strip_cg_prefix(self.get_cigar_string()).encode(
            "ascii", "replace"
        )
        try:
            st = native.cigar_text_stats(raw)
        except ValueError as e:
            kind, val = e.args[0]
            if kind == "op":
                raise CigarOpInvalid(val) from None
            frag = raw[val : val + 2].decode("ascii", "replace")
            if val < len(raw) and not raw[val : val + 1].isdigit():
                raise CigarOpInvalid(frag) from None
            raise ParseIntError(frag) from None
        if st is None:
            ops, lens = self.get_cigar_ops()
            cigar = cigar_stats_from_ops(ops, lens, self.is_negative)
            return rec_stat_from_cigar(cigar)
        cigar = Cigar()
        cigar.match_count, cigar.mismatch_count = st[0], st[1]
        if self.is_negative:
            cigar.inv_event = 1
            cigar.inv_ins_event, cigar.inv_ins_count = st[2], st[3]
            cigar.inv_del_event, cigar.inv_del_count = st[4], st[5]
        else:
            cigar.ins_event, cigar.ins_count = st[2], st[3]
            cigar.del_event, cigar.del_count = st[4], st[5]
        return rec_stat_from_cigar(cigar)

    def to_row(self) -> bytes:
        fields = [
            self.query_name,
            str(self.query_length),
            str(self.query_start),
            str(self.query_end),
            self.strand,
            self.target_name,
            str(self.target_length),
            str(self.target_start),
            str(self.target_end),
            str(self.matches),
            str(self.block_length),
            str(self.mapq),
        ] + list(self.tags)
        return ("\t".join(fields) + "\n").encode("ascii")


def parse_paf_line(line: str) -> PafRecord:
    fields = line.rstrip("\r\n").split("\t")
    if len(fields) < 12:
        raise ParsePafError(f"record has {len(fields)} fields, expected >= 12")
    return PafRecord(
        query_name=fields[0],
        query_length=_parse_u64(fields[1], "query_length"),
        query_start=_parse_u64(fields[2], "query_start"),
        query_end=_parse_u64(fields[3], "query_end"),
        strand=Strand.parse(fields[4]),
        target_name=fields[5],
        target_length=_parse_u64(fields[6], "target_length"),
        target_start=_parse_u64(fields[7], "target_start"),
        target_end=_parse_u64(fields[8], "target_end"),
        matches=_parse_u64(fields[9], "matches"),
        block_length=_parse_u64(fields[10], "block_length"),
        mapq=_parse_u64(fields[11], "mapq"),
        tags=fields[12:],
    )


class PafReader:
    def __init__(self, stream):
        self.inner = stream

    @classmethod
    def from_path(cls, path):
        from .compression import open_input

        return cls(open_input(path))

    def records(self):
        for raw in self.inner:
            line = raw.decode("ascii", "replace")
            stripped = line.strip()
            if not stripped or stripped.startswith("#"):
                continue
            yield parse_paf_line(line)


class PafWriter:
    def __init__(self, stream):
        self.inner = stream

    def write_record(self, rec: PafRecord):
        self.inner.write(rec.to_row())


_CS_RE = re.compile(r"(:[0-9]+|\*[a-z][a-z]|[=\+\-][A-Za-z]+)")


def cs_to_cigar(cs_tag: str) -> str:
    """Convert a cs:Z: short tag to a CIGAR string (reference:
    paf.rs:159-218): ':N' runs merge into M, '*ab' runs merge into X,
    '+seq'/'-seq' emit I/D."""
    out = []
    last_op = "M"
    last_len = 0
    for m in _CS_RE.finditer(cs_tag):
        part = m.group(0)
        head = part[0]
        if head == ":":
            length = int(part[1:])
            if last_op == "M":
                last_len += length
            else:
                if last_len > 0:
                    out.append(f"{last_len}{last_op}")
                last_op = "M"
                last_len = length
        elif head == "-":
            length = len(part) - 1
            if last_len > 0:
                out.append(f"{last_len}{last_op}")
            out.append(f"{length}D")
            last_len = 0
            last_op = "M"
        elif head == "+":
            length = len(part) - 1
            if last_len > 0:
                out.append(f"{last_len}{last_op}")
            out.append(f"{length}I")
            last_len = 0
            last_op = "M"
        elif head == "*":
            if last_op == "X":
                last_len += 1
            else:
                if last_len > 0:
                    out.append(f"{last_len}{last_op}")
                last_op = "X"
                last_len = 1
    if last_len > 0:
        out.append(f"{last_len}{last_op}")
    return "".join(out)
