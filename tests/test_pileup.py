"""Tests for the OPTIONAL pileup tool (dead code in the reference --
tools/pileup.rs is never compiled; semantics reproduced per-rule, output
format deterministic TSV, see PARITY.md)."""

import io

import pytest

from wgatools_tpu.io.maf import MafReader
from wgatools_tpu.tools.pileup import pileup


def _maf(records):
    buf = "##maf version=1.6\n"
    for tname, tstart, tsize, tseq, qname, qstart, qsize, qseq in records:
        tl = sum(1 for c in tseq if c != "-")
        ql = sum(1 for c in qseq if c != "-")
        buf += (
            "a score=0\n"
            f"s\t{tname}\t{tstart}\t{tl}\t+\t{tsize}\t{tseq}\n"
            f"s\t{qname}\t{qstart}\t{ql}\t+\t{qsize}\t{qseq}\n\n"
        )
    return MafReader(io.BytesIO(buf.encode()))


def _run(records, all_mode=False):
    out = io.BytesIO()
    pileup(_maf(records), out, all_mode)
    return out.getvalue().decode().splitlines()


def test_pileup_snp_ins_del_anchors():
    # t: A C G T A C    q: A C G T A C with edits:
    #   pos1-2 '=', pos3 SNP (G->T), then 2I (anchor at pos3's base),
    #   then 2D
    t = "ACG--TA"
    q = "ACTGGT-"
    # ext categories: = = X I I = D
    rows = _run([("ref", 10, 1000, t, "qry", 5, 1000, q)])
    # SNP at ref_pos 13 (start 10 + 3 cols; pileup.rs's X arm reads the
    # ref base BEFORE advancing: nth(ref_offset)) and the INS anchored
    # at the same position MERGE into one row (merge key = (chro, pos));
    # the uid's GT is last-wins per position, exactly the reference's
    # HashMap insert overwrite -- so GT points at +2GG (sorted index 1)
    assert rows[0].startswith("ref\t13\tG\t+2GG,T\t"), rows
    assert rows[0].endswith("=1/1"), rows
    # DEL: -1A anchored at ref_pos 14 (after the '=' at T advanced)
    assert rows[1].startswith("ref\t14\tT\t-1A\t"), rows
    # uid formatting (pileup.rs:166-169)
    assert "ref#10#15@qry#5#11" in rows[0], rows


def test_pileup_leading_indel_skipped():
    """An I/D run whose anchor base would be before the record start
    ('-' fallback) is skipped entirely (pileup.rs:208-211, 229-233)."""
    rows = _run([("ref", 0, 100, "--AC", "qry", 0, 100, "GGAC")])
    assert rows == []  # leading INS anchored at '-' -> dropped


def test_pileup_merge_and_gt_indices():
    """Two records sharing a SNP position: alts union, per-uid GT by the
    alt's 1-based index in sorted order (merge_pileup_vec semantics,
    made deterministic)."""
    recs = [
        ("ref", 0, 100, "ACGT", "q1", 0, 100, "ATGT"),  # SNP pos2 C->T
        ("ref", 0, 100, "ACGT", "q2", 0, 100, "AGGT"),  # SNP pos2 C->G
    ]
    rows = _run(recs)
    assert len(rows) == 1
    f = rows[0].split("\t")
    assert f[0] == "ref" and f[1] == "2" and f[2] == "C"
    assert f[3] == "G,T"  # sorted alts
    gts = dict(p.split("=") for p in f[4].split(";"))
    uid1 = "ref#0#4@q1#0#4"
    uid2 = "ref#0#4@q2#0#4"
    assert gts[uid1] == "2/2"  # T is alt index 2
    assert gts[uid2] == "1/1"  # G is alt index 1


def test_pileup_all_mode_emits_null_sites():
    rows = _run([("ref", 0, 100, "AC", "qry", 0, 100, "AC")], all_mode=True)
    assert [r.split("\t")[:4] for r in rows] == [
        ["ref", "1", "A", "A"],
        ["ref", "2", "C", "C"],
    ]


def test_pileup_cli(tmp_path):
    maf = (
        "##maf version=1.6\n"
        "a score=0\n"
        "s\tref\t0\t4\t+\t100\tACGT\n"
        "s\tqry\t0\t4\t+\t100\tATGT\n\n"
    )
    p = tmp_path / "x.maf"
    p.write_text(maf)
    import subprocess
    res = subprocess.run(
        ["python", "-m", "wgatools_tpu", "pileup", str(p)],
        capture_output=True, check=True,
    )
    assert res.stdout.decode().startswith("ref\t2\tC\tT\t")
