"""PAF overlap trimming (OPTIONAL EXTRA -- dead code in the reference).

The reference ships `src/tools/trimovp.rs` (85 LoC) fully commented
out, with its CLI entry also commented (`cli.rs:286-292`: name
"trimovp", visible alias "tr").  Per SURVEY.md §2.18 it is out of
parity scope; this module implements the same semantics as a *working*
tool, with intentional divergences recorded in PARITY.md:

- the reference iterates two `HashMap`s (target groups, then query
  groups) whose order is nondeterministic; we iterate both in
  FIRST-SEEN order so output is deterministic;
- within a (target, query) group the reference maintains sort order by
  `target_start` via binary-search insertion (`trimovp.rs:45-48` --
  despite its "sort by query start" comment, the probe compares
  `target_start`); tie order among equal starts is unspecified there,
  we use a stable sort (input order preserved on ties).

Semantics reproduced from trimovp.rs:
- group records by target name, then by query name, sorted by
  target_start (trimovp.rs:19-49);
- sweep each sorted group keeping one candidate: when the next record
  starts at/after the candidate's target_end the candidate is emitted
  and the next record becomes the candidate (trimovp.rs:64-68);
  otherwise the overlapping record replaces the candidate only if its
  target span is strictly longer (trimovp.rs:69-75);
- the final candidate of every group is emitted (trimovp.rs:78);
- records serialize as tab-separated PAF rows -- the reference's csv
  serialize of PafRecord (strand as +/-, tags flattened as trailing
  columns, trimovp.rs:50-53) is byte-identical to `PafRecord.to_row`.
"""


def trim_ovp(pafreader, writer):
    """Emit the longest non-overlapping record per (target, query) group
    (trim_ovp + trim_query, trimovp.rs:14-85)."""
    target_groups = {}
    for rec in pafreader.records():
        target_groups.setdefault(rec.target_name, []).append(rec)
    for recs in target_groups.values():
        query_groups = {}
        for rec in recs:
            query_groups.setdefault(rec.query_name, []).append(rec)
        for group in query_groups.values():
            group.sort(key=lambda r: r.target_start)
            it = iter(group)
            last = next(it)
            for rec in it:
                if rec.target_start >= last.target_end:
                    writer.write(last.to_row())
                    last = rec
                elif (
                    rec.target_end - rec.target_start
                    > last.target_end - last.target_start
                ):
                    last = rec
            writer.write(last.to_row())
    writer.flush()
