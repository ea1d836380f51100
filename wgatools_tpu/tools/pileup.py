"""MAF pileup (OPTIONAL EXTRA -- dead code in the reference).

The reference ships `src/tools/pileup.rs` (279 LoC) but never compiles
it: the module is absent from `tools/mod.rs:1-13` and its CLI entry is
commented out (`cli.rs:315-324`).  The code itself is unfinished -- it
debug-prints `MergedPileup` structs to stdout (`pileup.rs:94-96`),
ignores the output writer entirely, and derives GT indices from
`HashSet` iteration order (nondeterministic).  Per SURVEY.md §2.18 the
tool is out of parity scope; this module implements the SAME semantics
as a *working* tool (VERDICT r4 optional item), with intentional
divergences recorded in PARITY.md:

- output is a deterministic TSV (chro, pos, ref_base, comma-joined alt
  forms, semicolon-joined uid=GT pairs), alts sorted by their rendered
  form and GT indices assigned against that order;
- output goes to the writer (honouring -o), not stdout.

Semantics reproduced from pileup.rs:
- per record, columns group by the ext category table (=/I/D/X,
  pileup.rs:150-160);
- '=' runs advance; with --all every position emits a Null entry whose
  alt is the ref base (pileup.rs:184-204);
- 'I' runs emit one +<len><inserted query bases> entry anchored at the
  PREVIOUS ref base (skipped entirely when that anchor is a gap,
  pileup.rs:206-226);
- 'D' runs emit one -<len><deleted target bases> entry, same anchor
  rule, and advance ref_pos (pileup.rs:227-250);
- 'X' runs emit one SNP entry per column (pileup.rs:251-270);
- records merge by (chro, pos): union of alts, one uid=GT per
  contributing record where GT = k/k for the alt's 1-based index
  (merge_pileup_vec, pileup.rs:107-144); rows sort by (chro, pos).
- uid = "ref#start#end@query#start#end" (pileup.rs:166-169).
"""

import numpy as np

from ..core import cigar as C


def _record_pileups(rec, all_mode):
    """Yield (chro, pos, ref_base, alt_form, uid) tuples for one record
    (generate_pileup, pileup.rs:153-276) -- vectorized run walk instead
    of the reference's per-char group_by + quadratic nth() scans."""
    t = C.seq_bytes(rec.target_seq)
    q = C.seq_bytes(rec.query_seq)
    cat = C.classify_ext(t, q)
    vals, lens = C.rle(cat)
    ref_name = rec.target_name
    uid = (
        f"{ref_name}#{rec.target_start}#{rec.target_end}"
        f"@{rec.query_name}#{rec.query_start}#{rec.query_end}"
    )
    ref_pos = rec.target_start
    # one column cursor: the reference's separate ref_offset advances in
    # lockstep with the column offset in every arm (pileup.rs walks the
    # GAPPED target row with it), so a single `off` suffices
    off = 0
    out = []
    tchr = rec.target_seq.decode("ascii")
    qchr = rec.query_seq.decode("ascii")
    for v, ln in zip(vals.tolist(), np.asarray(lens).tolist()):
        if v == C.EQ:
            if all_mode:
                for k in range(ln):
                    ref_pos += 1
                    rb = tchr[off + k]
                    out.append((ref_name, ref_pos, rb, rb, uid))
            else:
                ref_pos += ln
        elif v == C.I:
            rb = tchr[off - 1] if off >= 1 else "-"
            if rb != "-":
                alt = f"+{ln}{qchr[off:off + ln]}"
                out.append((ref_name, ref_pos, rb, alt, uid))
        elif v == C.D:
            rb = tchr[off - 1] if off >= 1 else "-"
            if rb != "-":
                alt = f"-{ln}{tchr[off:off + ln]}"
                out.append((ref_name, ref_pos, rb, alt, uid))
            ref_pos += ln
        else:  # X: one SNP per column (ref base read BEFORE advancing)
            for k in range(ln):
                rb = tchr[off + k]
                ab = qchr[off + k]
                ref_pos += 1
                out.append((ref_name, ref_pos, rb, ab, uid))
        off += ln
    return out


def pileup(mafreader, writer, all_mode: bool = False):
    """Merged pileup over every record (pileup.rs:80-144), deterministic
    TSV output: chro pos ref_base alt1,alt2,... uid1=GT;uid2=GT"""
    merged = {}  # (chro, pos) -> [ref_base, {alt}, {uid: alt}]
    for rec in mafreader.records():
        for chro, pos, rb, alt, uid in _record_pileups(rec, all_mode):
            key = (chro, pos)
            entry = merged.setdefault(key, [rb, set(), {}])
            entry[1].add(alt)
            entry[2][uid] = alt
    for (chro, pos) in sorted(merged):
        rb, alts, gts = merged[(chro, pos)]
        alt_list = sorted(alts)
        idx = {a: k + 1 for k, a in enumerate(alt_list)}
        gt_str = ";".join(
            f"{uid}={idx[a]}/{idx[a]}" for uid, a in sorted(gts.items())
        )
        writer.write(
            (
                f"{chro}\t{pos}\t{rb}\t{','.join(alt_list)}\t{gt_str}\n"
            ).encode("ascii")
        )
    writer.flush()
