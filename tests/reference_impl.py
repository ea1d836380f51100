"""Naive per-character spec implementations for differential testing.

These mirror the *described behavior* of the reference's CIGAR engine
(reference: src/parser/cigar.rs) as simply as possible -- plain Python
loops over characters -- so the vectorized/device implementations in
wgatools_tpu can be checked against an independently-written oracle.
"""

from itertools import groupby


def cat_ext(c1: str, c2: str) -> str:
    if c1 == c2:
        return "="
    if c1 == "-":
        return "I"
    if c2 == "-":
        return "D"
    return "X"


def cat_caller(c1: str, c2: str) -> str:
    if c1 == "-":
        return "W" if c2 == "-" else "I"
    if c2 == "-":
        return "D"
    return "=" if c1 == c2 else "X"


def cat_m(c1: str, c2: str) -> str:
    if c1 == c2:
        return "M"
    if c1 == "-":
        return "I"
    if c2 == "-":
        return "D"
    return "M"


def runs(t: str, q: str, cat):
    pairs = [cat(a, b) for a, b in zip(t, q)]
    return [(k, len(list(g))) for k, g in groupby(pairs)]


def cigar_string(t: str, q: str) -> str:
    return "".join(f"{n}{k}" for k, n in runs(t, q, cat_ext))


def cigar_counts(t: str, q: str, negative: bool) -> dict:
    c = dict(
        match=0, mismatch=0, ins_event=0, ins=0, del_event=0, dele=0,
        inv_ins_event=0, inv_ins=0, inv_del_event=0, inv_del=0,
        inv_event=1 if negative else 0,
    )
    for k, n in runs(t, q, cat_ext):
        if k == "=":
            c["match"] += n
        elif k == "X":
            c["mismatch"] += n
        elif k == "I":
            if negative:
                c["inv_ins_event"] += 1
                c["inv_ins"] += n
            else:
                c["ins_event"] += 1
                c["ins"] += n
        elif k == "D":
            if negative:
                c["inv_del_event"] += 1
                c["inv_del"] += n
            else:
                c["del_event"] += 1
                c["dele"] += n
    return c


def trims(op_runs) -> tuple:
    """(head_ins, head_del, tail_ins, tail_del) per cigar.rs:155-245."""
    head_ins = head_del = tail_ins = tail_del = 0
    head = True
    for op, n in op_runs:
        if op in "MX=":
            tail_ins = tail_del = 0
            head = False
        elif op == "I":
            if head:
                head_ins += n
            tail_ins = n
        elif op == "D":
            if head:
                head_del += n
            tail_del = n
    return head_ins, head_del, tail_ins, tail_del


def chain_lines(op_runs):
    """State machine of cigar_unit_chain (cigar.rs:460-490).
    Returns (lines [(size, dq, dt)], final_size)."""
    size = qd = td = 0
    lines = []
    for op, n in op_runs:
        if op in "MX=":
            if size != 0 and (td + qd) != 0:
                lines.append((size, qd, td))
                size = 0
            size += n
            td = qd = 0
        elif op == "I":
            td += n
        elif op == "D":
            qd += n
    return lines, size


def tokenize(cigar: str):
    out = []
    num = ""
    for ch in cigar:
        if ch.isdigit():
            num += ch
        else:
            out.append((ch, int(num)))
            num = ""
    return out


def blocks_rows(op_runs, q_start: int, t_start: int):
    """Per-unit fold of cigar_unit_block (dead code, cigar.rs:83-114):
    M-like ops extend both ends, emit one (qs, qe, ts, te) row, then
    collapse the starts onto the ends; I advances query only, D target
    only.  '='/'X' are treated as M (working-tool divergence, see
    PARITY.md)."""
    qs = qe = q_start
    ts = te = t_start
    rows = []
    for op, n in op_runs:
        if op in "M=X":
            qe += n
            te += n
            rows.append((qs, qe, ts, te))
            qs, ts = qe, te
        elif op == "I":
            qs += n
            qe += n
        elif op == "D":
            ts += n
            te += n
        else:
            raise ValueError(op)
    return rows
