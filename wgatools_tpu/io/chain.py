"""UCSC chain reader/writer (reference: src/parser/chain.rs).

A chain record is a 13-field header line starting with "chain" followed by
data lines `size [dq] [dt]`; records are separated by blank lines.  Data
lines are stored as (size, query_diff, target_diff) triples matching the
reference's ChainDataLine (chain.rs:84-100): the second output column is the
accumulated D run ("query_diff"), the third the accumulated I run
("target_diff").
"""

from dataclasses import dataclass, field

import numpy as np

from ..core.cigar import Cigar, rec_stat_from_cigar
from ..core.strand import Strand
from ..errors import ParseChainError, ParseIntError


def fmt_f64(v: float) -> str:
    """Rust `{}` Display for f64: shortest round-trip decimal, always
    positional (never exponent notation), integral values without '.0'."""
    import math

    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "inf" if v > 0 else "-inf"
    if v == int(v):
        return str(int(v))
    s = np.format_float_positional(np.float64(v), unique=True)
    if s.endswith("."):
        s += "0"
    if s.startswith("."):
        s = "0" + s
    if s.startswith("-."):
        s = "-0" + s[1:]
    return s


def _parse_u64(s: str, what: str) -> int:
    # Rust u64::from_str grammar: optional leading '+', ASCII digits
    # only -- rejects negatives and Python int() leniency like its
    # maf/paf siblings (round-5 review finding)
    d = s[1:] if s[:1] == "+" else s
    if not d.isascii() or not d.isdigit():
        raise ParseIntError(s)
    v = int(d)
    # bound like the native parser (int64 arrays downstream): a 19+
    # digit coordinate errors instead of overflowing np.int64.  (The
    # reference's u64 parse allows up to 2^64-1; values in
    # (2^63, 2^64) are physically absurd coordinates and would not fit
    # the int64 columnar arrays either way.)
    if v > 0x7FFFFFFFFFFFFFFF:
        raise ParseIntError(s)
    return v


@dataclass
class SeqInfo:
    name: str = ""
    size: int = 0
    strand: str = Strand.POSITIVE
    start: int = 0
    end: int = 0


@dataclass
class ChainHeader:
    score: float = 255.0
    target: SeqInfo = field(default_factory=SeqInfo)
    query: SeqInfo = field(default_factory=SeqInfo)
    chain_id: int = 0

    def format(self) -> str:
        """Header line without trailing newline (chain.rs:185-204)."""
        t, q = self.target, self.query
        return (
            f"chain\t{fmt_f64(self.score)}\t{t.name}\t{t.size}\t{t.strand}\t"
            f"{t.start}\t{t.end}\t{q.name}\t{q.size}\t{q.strand}\t"
            f"{q.start}\t{q.end}\t{self.chain_id}"
        )


def chain_header_from_record(rec, head_ins, head_del, tail_ins, tail_del):
    """Build a ChainHeader from any AlignRecord-like object, applying the
    head/tail indel trim rule (reference: chain.rs:103-183).

    For negative-strand queries the reference remaps start/end sequentially
    (start is rewritten first and the new value feeds the end computation,
    chain.rs:136-137) -- reproduced bit-for-bit.
    """
    header = ChainHeader(
        score=255.0,
        target=SeqInfo(
            name=rec.target_name,
            size=rec.target_length,
            strand=Strand.POSITIVE,
            start=rec.target_start,
            end=rec.target_end,
        ),
        query=SeqInfo(
            name=rec.query_name,
            size=rec.query_length,
            strand=rec.query_strand,
            start=rec.query_start,
            end=rec.query_end,
        ),
        chain_id=0,
    )
    q = header.query
    t = header.target
    if q.strand == Strand.POSITIVE:
        q.start += head_ins
        t.start += head_del
        q.end -= tail_ins
        t.end -= tail_del
    else:
        t.start += head_del
        t.end -= tail_del
        q.start = q.size - (q.end - head_ins)
        q.end = q.size - (q.start + tail_ins)
    return header


class ChainRecord:
    """One chain record: header + columnar data lines (the final line
    parses with diffs 0).

    The data-line block parses LAZILY: `records()` hands the raw bytes in
    via `block` and the sizes/dqs/dts arrays materialize on first access.
    `to_cigar` on an unparsed record takes a fused one-pass native path
    (text -> cg string directly), which is the chain2paf hot loop."""

    __slots__ = ("header", "_sizes", "_dqs", "_dts", "_block")

    def __init__(self, header=None, sizes=None, dqs=None, dts=None,
                 block=None):
        self.header = header if header is not None else ChainHeader()
        if sizes is None and block is None:
            sizes = dqs = dts = np.zeros(0, np.int64)
        self._sizes, self._dqs, self._dts = sizes, dqs, dts
        self._block = block

    def _parse_lines(self):
        cols = _parse_block(self._block)
        self._sizes = cols["sizes"]
        self._dqs = cols["dqs"]
        self._dts = cols["dts"]
        self._block = None

    @property
    def sizes(self):
        if self._sizes is None:
            self._parse_lines()
        return self._sizes

    @property
    def dqs(self):
        if self._dqs is None:
            self._parse_lines()
        return self._dqs

    @property
    def dts(self):
        if self._dts is None:
            self._parse_lines()
        return self._dts

    @property
    def lines(self):
        """Tuple view of the columnar data lines."""
        return list(
            zip(self.sizes.tolist(), self.dqs.tolist(), self.dts.tolist())
        )

    def op_arrays(self):
        """Interleave data lines into CIGAR op arrays: per line `{size}M`
        then `{dt}I` then `{dq}D`, keeping zero-length M ops (the reference
        always emits the M, cigar.rs:580-582) and dropping zero diffs."""
        from ..core.cigar import OP_D, OP_I, OP_M

        n = self.sizes.shape[0]
        ops_mat = np.tile(
            np.array([OP_M, OP_I, OP_D], dtype=np.uint8), (n, 1)
        )
        lens_mat = np.stack([self.sizes, self.dts, self.dqs], axis=1)
        keep = lens_mat > 0
        keep[:, 0] = True  # M always emitted
        flat_keep = keep.reshape(-1)
        return ops_mat.reshape(-1)[flat_keep], lens_mat.reshape(-1)[flat_keep]

    # -- AlignRecord surface (chain.rs:385-453) --

    @property
    def query_name(self) -> str:
        return self.header.query.name

    @property
    def query_length(self) -> int:
        return self.header.query.size

    @property
    def query_start(self) -> int:
        return self.header.query.start

    @property
    def query_end(self) -> int:
        return self.header.query.end

    @property
    def query_strand(self) -> str:
        return self.header.query.strand

    @property
    def target_name(self) -> str:
        return self.header.target.name

    @property
    def target_length(self) -> int:
        return self.header.target.size

    @property
    def target_start(self) -> int:
        return self.header.target.start

    @property
    def target_end(self) -> int:
        return self.header.target.end

    @property
    def target_strand(self) -> str:
        return self.header.target.strand

    @property
    def target_align_size(self) -> int:
        return self.header.target.end - self.header.target.start

    @property
    def is_negative(self) -> bool:
        return self.header.query.strand == Strand.NEGATIVE

    def to_cigar(self) -> Cigar:
        """parse_chain_to_cigar (reference: cigar.rs:554-626): every data
        line emits `{size}M` then optional `{dt}I` / `{dq}D`.  Vectorized:
        interleaved op arrays + bulk string formatting."""
        from ..core.cigar import OP_D, OP_I

        from .. import native

        c = Cigar()
        inv = self.is_negative
        if inv:
            c.inv_event = 1
        if self._block is not None:
            # unparsed record: fused one-pass text -> cg (no arrays)
            try:
                fused = native.chain_text_to_cg(bytes(self._block))
            except ValueError as e:
                raise ParseChainError(
                    f"bad chain data line near byte {e.args[0]}"
                ) from None
        else:
            fused = native.chain_arrays_to_cg(self.sizes, self.dqs, self.dts)
        if fused is not None:
            cg, match, ins_ev, ins_ct, del_ev, del_ct = fused
        else:
            match = int(self.sizes.sum())
            ins_ev = int((self.dts > 0).sum())
            ins_ct = int(self.dts.sum())
            del_ev = int((self.dqs > 0).sum())
            del_ct = int(self.dqs.sum())
            ops, lens = self.op_arrays()
            # map op byte -> index into the char table "MID"
            cat = np.where(ops == OP_I, 1, np.where(ops == OP_D, 2, 0))
            chars = "MID"
            cg = "".join(
                f"{l}{chars[v]}" for v, l in zip(cat.tolist(), lens.tolist())
            )
        c.match_count = match
        if inv:
            c.inv_ins_event, c.inv_ins_count = ins_ev, ins_ct
            c.inv_del_event, c.inv_del_count = del_ev, del_ct
        else:
            c.ins_event, c.ins_count = ins_ev, ins_ct
            c.del_event, c.del_count = del_ev, del_ct
        c.cigar_string = cg
        return c

    def convert2paf(self):
        """chain -> PAF (reference: chain.rs:430-452).  Note block_length
        here omits insertion sizes, unlike the MAF conversion."""
        from .paf import PafRecord

        cigar = self.to_cigar()
        block_length = (
            cigar.match_count
            + cigar.mismatch_count
            + cigar.del_count
            + cigar.inv_del_count
        )
        return PafRecord(
            query_name=self.query_name,
            query_length=self.query_length,
            query_start=self.query_start,
            query_end=self.query_end,
            strand=self.query_strand,
            target_name=self.target_name,
            target_length=self.target_length,
            target_start=self.target_start,
            target_end=self.target_end,
            matches=cigar.match_count,
            block_length=block_length,
            mapq=255,
            tags=["cg:Z:" + cigar.cigar_string],
        )

    def get_stat(self):
        return rec_stat_from_cigar(self.to_cigar())


def _parse_header_line(rest: str) -> ChainHeader:
    fields = rest.split()
    names = (
        "score",
        "target_name",
        "target_size",
        "target_strand",
        "target_start",
        "target_end",
        "query_name",
        "query_size",
        "query_strand",
        "query_start",
        "query_end",
        "chain_id",
    )
    if len(fields) < 12:
        raise ParseChainError(f"Chain Line Field `{names[len(fields)]}` Missing")
    try:
        score = float(fields[0])
    except ValueError:
        # the reference's nom double() parser surfaces this as a chain
        # parse error, not a panic (chain.rs:211-218)
        raise ParseChainError(f"invalid score `{fields[0]}`") from None
    return ChainHeader(
        score=score,
        target=SeqInfo(
            name=fields[1],
            size=_parse_u64(fields[2], "target_size"),
            strand=Strand.parse(fields[3]),
            start=_parse_u64(fields[4], "target_start"),
            end=_parse_u64(fields[5], "target_end"),
        ),
        query=SeqInfo(
            name=fields[6],
            size=_parse_u64(fields[7], "query_size"),
            strand=Strand.parse(fields[8]),
            start=_parse_u64(fields[9], "query_start"),
            end=_parse_u64(fields[10], "query_end"),
        ),
        chain_id=_parse_u64(fields[11], "chain_id"),
    )


def _parse_data_line(line: str):
    fields = line.split()
    if not fields:
        raise ParseChainError("Chain Line Field `size` Missing")
    size = _parse_u64(fields[0], "size")
    dq = _parse_u64(fields[1], "query_diff") if len(fields) > 1 else 0
    dt = _parse_u64(fields[2], "target_diff") if len(fields) > 2 else 0
    return (size, dq, dt)


def _parse_block(block: bytes):
    """Parse a record's data-line block into columnar arrays."""
    from .. import native

    try:
        res = native.parse_chain_lines(bytes(block))
    except ValueError as e:
        raise ParseChainError(
            f"bad chain data line near byte {e.args[0]}"
        ) from None
    if res is not None:
        sizes, dqs, dts = res
        return {"sizes": sizes, "dqs": dqs, "dts": dts}
    rows = []
    for raw in block.decode("ascii", "replace").splitlines():
        line = raw.strip()
        if line:
            rows.append(_parse_data_line(line))
    if rows:
        arr = np.array(rows, dtype=np.int64)
        return {"sizes": arr[:, 0], "dqs": arr[:, 1], "dts": arr[:, 2]}
    z = np.zeros(0, np.int64)
    return {"sizes": z, "dqs": z, "dts": z}


class ChainReader:
    def __init__(self, stream):
        self.inner = stream

    @classmethod
    def from_path(cls, path):
        from .compression import open_input

        return cls(open_input(path))

    def records(self):
        """Parse all chain records (the reference also slurps the whole
        input, chain.rs:33-38).  Headers parse in Python (one per record);
        data-line blocks are grammar-checked here in one native pass --
        malformed lines error at read time exactly like the reference's
        eager parse -- but the columnar arrays materialize lazily
        (ChainRecord), so to_cigar can take the fused text path."""
        from .. import native

        data = self.inner.read()
        pos = 0
        n = len(data)
        while True:
            start = data.find(b"chain", pos)
            if start < 0:
                tail = data[pos:].strip()
                if tail:
                    raise ParseChainError("data line before chain header")
                return
            lead = data[pos:start].strip()
            if lead:
                raise ParseChainError("data line before chain header")
            eol = data.find(b"\n", start)
            if eol < 0:
                eol = n
            header = _parse_header_line(
                data[start + len(b"chain") : eol].decode("ascii", "replace")
            )
            nxt = data.find(b"chain", eol)
            block = data[eol + 1 : nxt if nxt >= 0 else n]
            if block and not block.endswith(b"\n"):
                # reference quirk reproduced (round-5 review finding):
                # data lines must be newline-TERMINATED
                # (line_not_chain, chain.rs:325-326); an unterminated
                # trailing line -- at EOF or abutting the next "chain"
                # header -- fails the fold and is silently discarded by
                # the take_while sweep (chain.rs:381)
                cut = block.rfind(b"\n")
                block = block[: cut + 1] if cut >= 0 else b""
            try:
                ok = native.validate_chain_lines(bytes(block))
            except ValueError as e:
                raise ParseChainError(
                    f"bad chain data line near byte {e.args[0]}"
                ) from None
            if ok is not None:
                rec = ChainRecord(header=header, block=block)
            else:
                # no native library: parse eagerly (also validates)
                rec = ChainRecord(header=header, **_parse_block(block))
            yield rec
            if nxt < 0:
                return
            pos = nxt


def write_chain_record(stream, header: ChainHeader, lines, final_size: int):
    """Write one chain record: header, data lines, final size, blank line
    (reference: converter.rs:148-173 + cigar.rs:291-293).

    `lines` is either a list of (size, dq, dt) tuples or a columnar
    (sizes, dqs, dts) array triple; the latter bulk-formats in C++."""
    stream.write(header.format().encode("ascii"))
    if isinstance(lines, tuple):
        from .. import native

        sizes, dqs, dts = lines
        blob = native.format_chain_lines(sizes, dqs, dts)
        if blob is None:
            blob = "".join(
                f"\n{s}\t{q}\t{t}"
                for s, q, t in zip(
                    sizes.tolist(), dqs.tolist(), dts.tolist()
                )
            ).encode("ascii")
        stream.write(blob)
    else:
        stream.write(
            "".join(
                f"\n{size}\t{dq}\t{dt}" for size, dq, dt in lines
            ).encode("ascii")
        )
    stream.write(f"\n{final_size}\n\n".encode("ascii"))
