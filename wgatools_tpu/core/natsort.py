"""Natural-order string comparison compatible with the Rust `natord` crate.

The reference natural-sorts output rows (stat TSV by ref_name, MAF records by
target name, VCF contigs) via natord::compare (reference: src/tools/stat.rs:116,
src/parser/maf.rs:338-351, src/tools/caller.rs:348).

Semantics: walk both strings; when both cursors sit on ASCII digits, consume
the full digit runs and compare them numerically (value first; when values are
equal the run with fewer leading zeros sorts first, matching natord's
"more-precise number wins" tiebreak); otherwise compare the characters by
ordinal.
"""

from functools import cmp_to_key


def _is_ascii_digit(ch: str) -> bool:
    # natord only treats ASCII 0-9 as digits; str.isdigit() would also accept
    # Unicode digits ('²', Eastern Arabic numerals) and then int() may raise.
    return "0" <= ch <= "9"


def _digit_run(s: str, i: int):
    j = i
    n = len(s)
    while j < n and _is_ascii_digit(s[j]):
        j += 1
    return s[i:j], j


def natural_cmp(a: str, b: str) -> int:
    ia = ib = 0
    na, nb = len(a), len(b)
    while ia < na and ib < nb:
        ca, cb = a[ia], b[ib]
        if _is_ascii_digit(ca) and _is_ascii_digit(cb):
            run_a, ia = _digit_run(a, ia)
            run_b, ib = _digit_run(b, ib)
            va, vb = int(run_a), int(run_b)
            if va != vb:
                return -1 if va < vb else 1
            if len(run_a) != len(run_b):
                # equal value, different leading zeros: shorter run first
                return -1 if len(run_a) < len(run_b) else 1
        else:
            if ca != cb:
                return -1 if ca < cb else 1
            ia += 1
            ib += 1
    if ia < na:
        return 1
    if ib < nb:
        return -1
    return 0


natural_key = cmp_to_key(natural_cmp)


def rank_by_natural(names):
    """Dense-rank dict {name: i} under natord order.

    Output-row sorts compare the same few names hundreds of thousands of
    times; sorting the unique names once with the comparator and then
    sorting rows by integer rank yields the exact same total order (stable
    sort + equal names compare 0) at a fraction of the cost."""
    order = sorted(set(names), key=natural_key)
    return {n: i for i, n in enumerate(order)}
