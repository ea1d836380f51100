"""Columnar CIGAR engine (host side).

This replaces the reference's char-loop CIGAR engine (reference:
src/parser/cigar.rs, 985 LoC) with vectorized numpy over uint8 byte arrays.
Sequences are kept as raw ASCII bytes so that case-sensitive comparisons match
the reference exactly ('A' vs 'a' is a mismatch, reference: cigar.rs:298-308).

Column category codes (uint8):
    EQ=0 ('='), X=1, I=2, D=3, W=4 (gap/gap, caller mode only)

Three classification modes mirror the reference:
  * ext    — cigar_cat_ext    (cigar.rs:298-308):  c1==c2 -> '=' (note: this
             maps gap/gap columns to '='), then I/D/X.
  * caller — cigar_cat_ext_caller (cigar.rs:314-328): gap/gap -> W.
  * m      — cigar_cat (cigar.rs:331-341): matches and mismatches merge to M.

The device mirrors of these kernels live in wgatools_tpu.ops.
"""

from dataclasses import dataclass

import numpy as np

from ..errors import CigarOpInvalid, ParseIntError, WGAError

GAP = np.uint8(ord("-"))

EQ, X, I, D, W = np.uint8(0), np.uint8(1), np.uint8(2), np.uint8(3), np.uint8(4)

# category code -> cigar op char
CAT_CHARS = np.frombuffer(b"=XIDW", dtype=np.uint8)

OP_EQ = ord("=")
OP_X = ord("X")
OP_I = ord("I")
OP_D = ord("D")
OP_M = ord("M")
OP_S = ord("S")
OP_H = ord("H")
OP_W = ord("W")


def seq_bytes(s) -> np.ndarray:
    """Return a uint8 view of a str/bytes sequence."""
    if isinstance(s, np.ndarray):
        return s
    if isinstance(s, str):
        s = s.encode("ascii")
    return np.frombuffer(s, dtype=np.uint8)


def classify_ext(t: np.ndarray, q: np.ndarray) -> np.ndarray:
    """cigar_cat_ext: '=' when equal (incl. gap/gap), I/D for one-sided gaps, X."""
    eq = t == q
    ti = t == GAP
    qi = q == GAP
    cat = np.where(eq, EQ, np.where(ti, I, np.where(qi, D, X)))
    return cat.astype(np.uint8)


def classify_caller(t: np.ndarray, q: np.ndarray) -> np.ndarray:
    """cigar_cat_ext_caller: gap/gap -> W, then I/D/=/X."""
    ti = t == GAP
    qi = q == GAP
    cat = np.where(
        ti,
        np.where(qi, W, I),
        np.where(qi, D, np.where(t == q, EQ, X)),
    )
    return cat.astype(np.uint8)


def classify_m(t: np.ndarray, q: np.ndarray) -> np.ndarray:
    """cigar_cat: everything non-gap merges to M (coded EQ), one-sided gaps I/D."""
    ti = t == GAP
    qi = q == GAP
    cat = np.where(ti & ~qi, I, np.where(qi & ~ti, D, EQ))
    return cat.astype(np.uint8)


def rle(cat: np.ndarray):
    """Run-length encode a category array -> (values, lengths).

    The vectorized analog of itertools group_by in the reference's column
    scans (cigar.rs:359-361).
    """
    n = cat.shape[0]
    if n == 0:
        return cat[:0], np.zeros(0, dtype=np.int64)
    boundaries = np.flatnonzero(cat[1:] != cat[:-1])
    starts = np.concatenate(([0], boundaries + 1))
    ends = np.concatenate((boundaries + 1, [n]))
    return cat[starts], (ends - starts).astype(np.int64)


@dataclass
class Cigar:
    """Parsed CIGAR with per-op statistics (reference: cigar.rs:16-29)."""

    cigar_string: str = ""
    match_count: int = 0
    mismatch_count: int = 0
    ins_event: int = 0
    ins_count: int = 0
    del_event: int = 0
    del_count: int = 0
    inv_ins_event: int = 0
    inv_ins_count: int = 0
    inv_del_event: int = 0
    inv_del_count: int = 0
    inv_event: int = 0


@dataclass
class RecStat:
    """Per-record statistics (reference: src/parser/common.rs:99-140)."""

    aligned_size: int = 0
    matched: int = 0
    mismatched: int = 0
    ins_event: int = 0
    del_event: int = 0
    ins_size: int = 0
    del_size: int = 0
    inv_ins_event: int = 0
    inv_ins_size: int = 0
    inv_del_event: int = 0
    inv_del_size: int = 0
    inv_event: int = 0
    inv_size: float = 0.0


def rec_stat_from_cigar(c: Cigar) -> RecStat:
    """RecStat::from(Cigar) (reference: common.rs:116-140)."""
    rs = RecStat(
        matched=c.match_count,
        mismatched=c.mismatch_count,
        ins_event=c.ins_event,
        del_event=c.del_event,
        ins_size=c.ins_count,
        del_size=c.del_count,
        inv_ins_event=c.inv_ins_event,
        inv_ins_size=c.inv_ins_count,
        inv_del_event=c.inv_del_event,
        inv_del_size=c.inv_del_count,
        inv_event=c.inv_event,
    )
    rs.aligned_size = rs.matched + rs.mismatched + rs.del_size + rs.inv_del_size
    query_align_size = rs.matched + rs.mismatched + rs.ins_size + rs.inv_ins_size
    if rs.inv_event != 0:
        # f32 arithmetic in the reference (common.rs:135-137)
        rs.inv_size = float(
            np.float32(rs.aligned_size + query_align_size)
            / np.float32(rs.inv_event + 1)
        )
    return rs


def runs_to_cigar_string(vals: np.ndarray, lens: np.ndarray) -> str:
    """Format RLE runs as a CIGAR string using the category chars."""
    if len(vals) == 0:
        return ""
    from .. import native

    s = native.format_runs(vals, np.asarray(lens, dtype=np.int64), b"=XIDW")
    if s is not None:
        return s
    chars = CAT_CHARS[vals]
    parts = []
    append = parts.append
    for ln, ch in zip(lens.tolist(), chars.tolist()):
        append(str(ln))
        append(chr(ch))
    return "".join(parts)


def cigar_from_runs(
    vals: np.ndarray,
    lens: np.ndarray,
    negative: bool,
    with_h: bool = False,
    h_begin: int = 0,
    h_end: int = 0,
) -> Cigar:
    """Build a Cigar (stats + string) from ext-classified runs.

    Mirrors parse_maf_seq_to_cigar (reference: cigar.rs:344-432), including
    inversion routing of indel counts for negative-strand records.
    """
    c = Cigar()
    lens = np.asarray(lens, dtype=np.int64)
    c.match_count = int(lens[vals == EQ].sum())
    c.mismatch_count = int(lens[vals == X].sum())
    ins_mask = vals == I
    del_mask = vals == D
    ins_events = int(ins_mask.sum())
    del_events = int(del_mask.sum())
    ins_total = int(lens[ins_mask].sum())
    del_total = int(lens[del_mask].sum())
    if negative:
        c.inv_event = 1
        c.inv_ins_event, c.inv_ins_count = ins_events, ins_total
        c.inv_del_event, c.inv_del_count = del_events, del_total
    else:
        c.ins_event, c.ins_count = ins_events, ins_total
        c.del_event, c.del_count = del_events, del_total
    body = runs_to_cigar_string(vals, lens)
    if with_h:
        c.cigar_string = f"{h_begin}H{body}{h_end}H"
    else:
        c.cigar_string = body
    return c


def _zip_trunc(t_seq, q_seq):
    """Reference zip semantics for malformed records whose rows differ
    in length: every per-column fold iterates seq1.zip(seq2)
    (e.g. cigar.rs:344-432), which stops at the SHORTER row.  Mirror it
    (the native wrappers truncate identically; round-5 review finding --
    the numpy fallback previously raised a raw broadcast ValueError)."""
    n = min(t_seq.shape[0], q_seq.shape[0])
    return t_seq[:n], q_seq[:n]


def ext_runs(t_seq: np.ndarray, q_seq: np.ndarray):
    """Classify + RLE in ext mode; native C++ path when available."""
    from .. import native

    t_seq, q_seq = _zip_trunc(t_seq, q_seq)
    res = native.classify_and_rle(t_seq, q_seq, caller=False)
    if res is not None:
        return res
    return rle(classify_ext(t_seq, q_seq))


def caller_runs(t_seq: np.ndarray, q_seq: np.ndarray):
    """Classify + RLE in caller mode (gap/gap -> W)."""
    from .. import native

    t_seq, q_seq = _zip_trunc(t_seq, q_seq)
    res = native.classify_and_rle(t_seq, q_seq, caller=True)
    if res is not None:
        return res
    return rle(classify_caller(t_seq, q_seq))


def cigar_from_seqs(
    t_seq: np.ndarray,
    q_seq: np.ndarray,
    negative: bool,
    with_h: bool = False,
    h_begin: int = 0,
    h_end: int = 0,
) -> Cigar:
    """parse_maf_seq_to_cigar over byte arrays (reference: cigar.rs:344-432)."""
    from .. import native

    t_seq, q_seq = _zip_trunc(t_seq, q_seq)
    res = native.classify_rle_format(t_seq, q_seq, caller=False)
    if res is None:
        vals, lens = ext_runs(t_seq, q_seq)
        return cigar_from_runs(vals, lens, negative, with_h, h_begin, h_end)
    body, stats = res
    c = Cigar()
    c.match_count = stats[2 * EQ + 1]
    c.mismatch_count = stats[2 * X + 1]
    if negative:
        c.inv_event = 1
        c.inv_ins_event, c.inv_ins_count = stats[2 * I], stats[2 * I + 1]
        c.inv_del_event, c.inv_del_count = stats[2 * D], stats[2 * D + 1]
    else:
        c.ins_event, c.ins_count = stats[2 * I], stats[2 * I + 1]
        c.del_event, c.del_count = stats[2 * D], stats[2 * D + 1]
    if with_h:
        c.cigar_string = f"{h_begin}H{body}{h_end}H"
    else:
        c.cigar_string = body
    return c


# ---------------------------------------------------------------------------
# CIGAR string <-> op arrays
# ---------------------------------------------------------------------------

_DIGIT_MASK = np.zeros(256, dtype=bool)
for _d in b"0123456789":
    _DIGIT_MASK[_d] = True


def raise_tokenize_error(raw: bytes, pos: int):
    """Translate a native tokenizer byte position into the reference's
    error types (cst2cu, cigar.rs:43-56): non-digit at pos -> invalid op,
    otherwise a numeric parse failure."""
    frag = raw[pos : pos + 2].decode("ascii", "replace")
    if pos < len(raw) and not raw[pos : pos + 1].isdigit():
        raise CigarOpInvalid(frag) from None
    raise ParseIntError(frag) from None


def tokenize_cigar(cigar: str):
    """Tokenize a CIGAR string into (ops uint8, lens int64) arrays.

    Vectorized analog of the reference's nom tokenizer (cigar.rs:59-75).
    Raises ParseIntError / CigarOpInvalid on malformed input like the
    reference's cst2cu (cigar.rs:43-56).
    """
    if not cigar:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    from .. import native

    # "replace": corrupt tag bytes arrive as U+FFFD from lenient
    # decodes; map to '?' so BOTH tokenizer paths (native and numpy)
    # reject them as a clean parse error instead of a
    # UnicodeEncodeError traceback
    cigar = (
        cigar.encode("ascii", "replace") if isinstance(cigar, str) else cigar
    )
    if native.available():
        try:
            return native.tokenize_cigar(cigar)
        except ValueError as e:
            raise_tokenize_error(cigar, e.args[0])
    b = seq_bytes(cigar)
    isdig = _DIGIT_MASK[b]
    # op positions: non-digit bytes
    op_pos = np.flatnonzero(~isdig)
    if op_pos.size == 0:
        raise ParseIntError(cigar)
    # every non-digit byte must be a single op following >=1 digit, and ops
    # must be isolated (no two adjacent non-digits) and the string must end
    # with an op
    if op_pos[-1] != b.shape[0] - 1:
        raise CigarOpInvalid(cigar[op_pos[-1] :])
    if op_pos.size > 1 and np.any(np.diff(op_pos) == 1):
        bad = int(op_pos[np.flatnonzero(np.diff(op_pos) == 1)[0]])
        raise CigarOpInvalid(cigar[bad : bad + 2])
    if op_pos[0] == 0:
        raise ParseIntError("")
    ops = b[op_pos]
    starts = np.concatenate(([0], op_pos[:-1] + 1))
    lens = np.empty(op_pos.size, dtype=np.int64)
    # parse digit runs; vectorized horner over a padded digit matrix
    run_lens = op_pos - starts
    max_run = int(run_lens.max())
    digits = b.astype(np.int64) - ord("0")
    mat = np.zeros((op_pos.size, max_run), dtype=np.int64)
    for k in range(max_run):
        take = run_lens > k
        mat[take, k] = digits[starts[take] + k]
    lens[:] = 0
    for k in range(max_run):
        take = run_lens > k
        lens[take] = lens[take] * 10 + mat[take, k]
    if np.any(run_lens == 0):
        raise ParseIntError("")
    return ops, lens


def strip_cg_prefix(cigar: str) -> str:
    """Strip the 'cg:Z:' tag prefix (reference: cigar.rs:258 et al.)."""
    from ..errors import CigarTagNotFound

    if not cigar.startswith("cg:Z:"):
        raise CigarTagNotFound()
    return cigar[5:]


_VALID_STAT_OPS = frozenset((OP_M, OP_EQ, OP_X, OP_I, OP_D))


def cigar_stats_from_ops(ops: np.ndarray, lens: np.ndarray, negative: bool) -> Cigar:
    """parse_paf_to_cigar stats (reference: cigar.rs:629-707).

    M and '=' both count as matches; X as mismatch; I/D as indel events
    routed to inv_* when the record is negative strand.  Any other op is an
    error, matching the reference.
    """
    for op in np.unique(ops).tolist():
        if op not in _VALID_STAT_OPS:
            raise CigarOpInvalid(chr(op))
    c = Cigar()
    lens = np.asarray(lens, dtype=np.int64)
    m_mask = (ops == OP_M) | (ops == OP_EQ)
    c.match_count = int(lens[m_mask].sum())
    c.mismatch_count = int(lens[ops == OP_X].sum())
    ins_mask = ops == OP_I
    del_mask = ops == OP_D
    ie, ic = int(ins_mask.sum()), int(lens[ins_mask].sum())
    de, dc = int(del_mask.sum()), int(lens[del_mask].sum())
    if negative:
        c.inv_event = 1
        c.inv_ins_event, c.inv_ins_count = ie, ic
        c.inv_del_event, c.inv_del_count = de, dc
    else:
        c.ins_event, c.ins_count = ie, ic
        c.del_event, c.del_count = de, dc
    return c


def trims_from_ops(ops: np.ndarray, lens: np.ndarray):
    """Head/tail indel trim sizes (reference: cigar.rs:155-199, 202-245).

    Returns (head_ins, head_del, tail_ins, tail_del): the summed I and D run
    lengths before the first M-type op, and the length of the *last* I and
    last D op after the last M-type op (the reference overwrites, not sums,
    the tail counters).  Vectorized.
    """
    ops = np.asarray(ops)
    lens = np.asarray(lens, dtype=np.int64)
    is_m = (ops == OP_M) | (ops == OP_EQ) | (ops == OP_X)
    is_i = ops == OP_I
    is_d = ops == OP_D
    if not np.all(is_m | is_i | is_d):
        bad = ops[~(is_m | is_i | is_d)][0]
        raise CigarOpInvalid(chr(bad))
    m_idx = np.flatnonzero(is_m)
    if m_idx.size == 0:
        # no M at all: everything is "head"; the tail counters end up
        # holding the last I/D lengths (never reset)
        head_ins = int(lens[is_i].sum())
        head_del = int(lens[is_d].sum())
        i_pos = np.flatnonzero(is_i)
        d_pos = np.flatnonzero(is_d)
        tail_ins = int(lens[i_pos[-1]]) if i_pos.size else 0
        tail_del = int(lens[d_pos[-1]]) if d_pos.size else 0
        return head_ins, head_del, tail_ins, tail_del
    first_m, last_m = int(m_idx[0]), int(m_idx[-1])
    head_ins = int(lens[: first_m][is_i[:first_m]].sum())
    head_del = int(lens[: first_m][is_d[:first_m]].sum())
    tail_i = np.flatnonzero(is_i[last_m + 1 :])
    tail_d = np.flatnonzero(is_d[last_m + 1 :])
    tail_ins = int(lens[last_m + 1 + tail_i[-1]]) if tail_i.size else 0
    tail_del = int(lens[last_m + 1 + tail_d[-1]]) if tail_d.size else 0
    return head_ins, head_del, tail_ins, tail_del


# ---------------------------------------------------------------------------
# Chain data lines
# ---------------------------------------------------------------------------

def chain_line_arrays_from_ops(ops: np.ndarray, lens: np.ndarray):
    """Chain data lines from CIGAR ops, as columnar arrays.

    Mirrors cigar_unit_chain's state machine (reference: cigar.rs:460-490):
    M/X/= accumulate `size` (merging runs separated by empty diffs), I
    accumulates target_diff, D accumulates query_diff; a line
    (size, query_diff, target_diff) is emitted when a new M-run starts with
    pending diffs; the final line carries only the last size.

    Returns (sizes, dqs, dts, final_size) int64 arrays.  Vectorized over
    runs with reduceat.
    """
    ops = np.asarray(ops)
    lens = np.asarray(lens, dtype=np.int64)
    empty = np.zeros(0, dtype=np.int64)
    for op in np.unique(ops).tolist():
        if op not in _VALID_STAT_OPS:
            raise CigarOpInvalid(chr(op))
    is_m = (ops == OP_M) | (ops == OP_EQ) | (ops == OP_X)
    m_idx = np.flatnonzero(is_m)
    if m_idx.size == 0:
        return empty, empty, empty, 0
    if np.any(lens[m_idx] == 0):
        # a zero-length M op is a flush-or-DROP barrier in the
        # reference's fold (size==0 blocks the flush, the M arm then
        # discards the pending diffs, cigar.rs:467-477) -- data-dependent
        # sequencing the merge formulation below cannot express; take
        # the reference-faithful scalar walk (pathological input, cold)
        return _chain_lines_scalar(ops, lens)
    m_sizes = lens[m_idx]
    # diffs accumulated between consecutive M runs
    ins_lens = np.where(ops == OP_I, lens, 0)
    del_lens = np.where(ops == OP_D, lens, 0)
    cum_ins = np.concatenate(([0], np.cumsum(ins_lens)))
    cum_del = np.concatenate(([0], np.cumsum(del_lens)))
    # gap between m_idx[k] and m_idx[k+1]
    td = cum_ins[m_idx[1:]] - cum_ins[m_idx[:-1] + 1]
    qd = cum_del[m_idx[1:]] - cum_del[m_idx[:-1] + 1]
    nonzero_gap = (td + qd) != 0
    # merge consecutive M runs across zero gaps
    seg_starts = np.concatenate(([0], np.flatnonzero(nonzero_gap) + 1))
    merged = np.add.reduceat(m_sizes, seg_starts)
    gap_sel = np.flatnonzero(nonzero_gap)
    return merged[:-1], qd[gap_sel], td[gap_sel], int(merged[-1])


def _chain_lines_scalar(ops, lens):
    """cigar_unit_chain's exact fold (cigar.rs:460-490), scalar: flush a
    line only when BOTH the accumulated size and the pending diffs are
    nonzero; every M-like op resets the diffs (dropping them when the
    flush was blocked)."""
    size = qd = td = 0
    sizes, qds, tds = [], [], []
    for op, n in zip(ops.tolist(), np.asarray(lens).tolist()):
        if op in (OP_M, OP_EQ, OP_X):
            if size != 0 and (td + qd) != 0:
                sizes.append(size)
                qds.append(qd)
                tds.append(td)
                size = 0
            size += n
            td = qd = 0
        elif op == OP_I:
            td += n
        elif op == OP_D:
            qd += n
    return (
        np.asarray(sizes, np.int64),
        np.asarray(qds, np.int64),
        np.asarray(tds, np.int64),
        int(size),
    )


def chain_lines_from_ops(ops: np.ndarray, lens: np.ndarray):
    """List-of-tuples view of chain_line_arrays_from_ops:
    ([(size, dq, dt), ...], final_size)."""
    sizes, dqs, dts, final = chain_line_arrays_from_ops(ops, lens)
    lines = list(zip(sizes.tolist(), dqs.tolist(), dts.tolist()))
    return lines, final


_CAT2OP = np.zeros(5, dtype=np.uint8)
_CAT2OP[EQ] = OP_M
_CAT2OP[X] = OP_X
_CAT2OP[I] = OP_I
_CAT2OP[D] = OP_D


def chain_lines_from_cat_runs(vals: np.ndarray, lens: np.ndarray):
    """Chain data lines from m-mode classified runs (parse_maf_seq_to_chain,
    reference: cigar.rs:435-458).  Category codes EQ(=M)/I/D."""
    return chain_lines_from_ops(_CAT2OP[vals], lens)


def chain_line_arrays_from_cat_runs(vals: np.ndarray, lens: np.ndarray):
    return chain_line_arrays_from_ops(_CAT2OP[vals], lens)


# ---------------------------------------------------------------------------
# Sequence reconstruction from ops (gap insertion / pseudo-maf)
# ---------------------------------------------------------------------------

def insert_gaps_by_ops(ops, lens, t_raw: bytes, q_raw: bytes):
    """Insert '-' gaps into raw target/query per CIGAR.

    Equivalent to parse_cigar_to_insert (reference: cigar.rs:492-551) but
    fully vectorized instead of repeated String::insert_str: expand the op
    table to per-column gap masks, then gather source bytes through
    cumulative non-gap indices.  M/=/X consume both sources, I puts gaps in
    target while consuming query, D puts gaps in query while consuming
    target.  Returns (t_gapped bytes, q_gapped bytes).

    Faithful to parse_cigar_to_insert's insert-into-copy formulation
    (cigar.rs:492-551), including its edge semantics on sources whose
    length disagrees with the CIGAR (round-5 review finding -- both
    engines previously fabricated bytes by repeating the last base):

    - a LONGER source keeps its unconsumed tail in place (the reference
      inserts gaps into the full string);
    - a SHORTER source is fine as long as no later I/D insert offset
      exceeds the current string length -- the output row simply ends
      early (possibly shorter than its partner, as the reference
      emits);
    - an I/D insert past the current end raises WGAError (the
      reference's String::insert_str panics there).

    Hot path (lengths exactly matching the CIGAR): single C++
    memcpy/memset pass per run (differential-tested against the numpy
    formulation below).
    """
    from .. import native

    ops = np.asarray(ops)
    lens = np.asarray(lens, dtype=np.int64)
    is_m = (ops == OP_M) | (ops == OP_EQ) | (ops == OP_X)
    is_i = ops == OP_I
    is_d = ops == OP_D
    if not np.all(is_m | is_i | is_d):
        bad = ops[~(is_m | is_i | is_d)][0]
        raise CigarOpInvalid(chr(bad))
    # reference panic condition: the shared offset minus gaps already
    # inserted into THIS string = the non-gap columns before the run;
    # insert_str panics when that exceeds the string's current length
    non_i_before = np.cumsum(np.where(is_i, 0, lens)) - np.where(
        is_i, 0, lens
    )
    non_d_before = np.cumsum(np.where(is_d, 0, lens)) - np.where(
        is_d, 0, lens
    )
    if np.any(non_i_before[is_i] > len(t_raw)) or np.any(
        non_d_before[is_d] > len(q_raw)
    ):
        raise WGAError(
            "CIGAR gap insert past the end of a source sequence "
            "(reference panics here, cigar.rs:492-551): sources have "
            f"{len(t_raw)}/{len(q_raw)} target/query bytes"
        )
    need_t = int(lens[is_m | is_d].sum())
    need_q = int(lens[is_m | is_i].sum())
    if (
        need_t == len(t_raw)
        and need_q == len(q_raw)
        and native.available()
    ):
        try:
            res = native.insert_gaps(ops, lens, t_raw, q_raw)
        except ValueError as e:
            raise CigarOpInvalid(e.args[0]) from None
        if res is not None:
            return res
    t_arr = seq_bytes(t_raw)
    q_arr = seq_bytes(q_raw)

    def build(gap_runs, src):
        # final row = src with every gap run inserted at its op-frame
        # offset: length len(src) + total_gaps, the op-frame gap mask
        # truncated (short src) or zero-extended (long src) to it
        mask = np.repeat(gap_runs, lens)
        out_len = len(src) + int(lens[gap_runs].sum())
        if out_len <= mask.size:
            mask = mask[:out_len]
        else:
            mask = np.concatenate(
                [mask, np.zeros(out_len - mask.size, dtype=bool)]
            )
        if out_len == 0:
            return b""
        base = src if len(src) else np.array([GAP], dtype=np.uint8)
        idx = np.minimum(np.cumsum(~mask) - 1, len(base) - 1)
        return (
            np.where(mask, GAP, base[idx]).astype(np.uint8).tobytes()
        )

    return build(is_i, t_arr), build(is_d, q_arr)


def insert_gaps_by_chain(lines, final_size, t_raw: bytes, q_raw: bytes):
    """Gap insertion driven by chain data lines (reference:
    converter.rs:360-388): per line copy `size` from both, then target gets
    `target_diff` gaps (query real), then query gets `query_diff` gaps."""
    t_parts, q_parts = [], []
    t_off = q_off = 0
    for size, dq, dt in lines:
        t_parts.append(t_raw[t_off : t_off + size])
        q_parts.append(q_raw[q_off : q_off + size])
        t_off += size
        q_off += size
        if dt:
            t_parts.append(b"-" * dt)
            q_parts.append(q_raw[q_off : q_off + dt])
            q_off += dt
        if dq:
            t_parts.append(t_raw[t_off : t_off + dq])
            q_parts.append(b"-" * dq)
            t_off += dq
    t_parts.append(t_raw[t_off : t_off + final_size])
    q_parts.append(q_raw[q_off : q_off + final_size])
    return b"".join(t_parts), b"".join(q_parts)


def pseudo_maf_seq_by_ops(ops, lens, raw_q: bytes, base: bool) -> bytes:
    """gen_pesudo_maf_by_cigar (reference: cigar.rs:744-804), vectorized.

    base=True: project the real query bases onto the target axis (drop
    insertions, '-' for deletions).  base=False: emit '1' (match), '0'
    (mismatch), '-' (deletion) symbols; insertions are skipped.
    """
    ops = np.asarray(ops)
    lens = np.asarray(lens, dtype=np.int64)
    is_m = (ops == OP_M) | (ops == OP_EQ)
    is_x = ops == OP_X
    is_i = (ops == OP_I) | (ops == OP_S)
    is_d = ops == OP_D
    if base:
        # emitted columns: M/X (query bytes) and D (gaps); the query source
        # advances over M/X and I (inserted bases are drained)
        emit = is_m | is_x | is_d
        out_gap = np.repeat(is_d[emit], lens[emit])
        # query source offset at the start of each emitted op
        q_adv = np.where(is_m | is_x | is_i, lens, 0)
        q_start_all = np.concatenate(([0], np.cumsum(q_adv)[:-1]))
        q_starts = q_start_all[emit]
        out_lens = lens[emit]
        if out_lens.sum() == 0:
            return b""
        intra = np.arange(int(out_lens.sum())) - np.repeat(
            np.cumsum(out_lens) - out_lens, out_lens
        )
        src = np.repeat(q_starts, out_lens) + intra
        q_arr = seq_bytes(raw_q)
        if len(q_arr) == 0:
            q_arr = np.array([GAP], dtype=np.uint8)
        out = np.where(
            out_gap, GAP, q_arr[np.minimum(src, len(q_arr) - 1)]
        )
        return out.astype(np.uint8).tobytes()
    # symbol mode: per-op constant symbols, insertions skipped
    sym = np.full(ops.shape[0], 0, dtype=np.uint8)
    sym[is_m] = ord("1")
    sym[is_x] = ord("0")
    sym[is_d] = GAP
    emit = is_m | is_x | is_d
    return np.repeat(sym[emit], lens[emit]).tobytes()


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

_RC_TABLE = np.arange(256, dtype=np.uint8)
for _a, _b in [("A", "T"), ("C", "G"), ("G", "C"), ("T", "A"), ("N", "N"),
               ("a", "t"), ("c", "g"), ("g", "c"), ("t", "a"), ("n", "n")]:
    _RC_TABLE[ord(_a)] = ord(_b)
_VALID_RC = np.zeros(256, dtype=bool)
for _c in b"ACGTNacgtn":
    _VALID_RC[_c] = True


def reverse_complement(seq: bytes) -> bytes:
    """Reverse complement with the reference's strict base alphabet
    (reference: src/utils.rs:83-101)."""
    from ..errors import InvalidBase
    from .. import native

    arr = seq_bytes(seq)
    if native.available():
        try:
            return native.reverse_complement(arr)
        except ValueError as e:
            raise InvalidBase(chr(arr[e.args[0]])) from None
    if not np.all(_VALID_RC[arr]):
        bad = arr[~_VALID_RC[arr]][0]
        raise InvalidBase(chr(bad))
    return _RC_TABLE[arr][::-1].tobytes()


def count_non_gap(seq: np.ndarray) -> int:
    """Count aligned (non-'-') symbols; recount_align_size analog
    (reference: common.rs:179-190)."""
    return int((seq_bytes(seq) != GAP).sum())
