"""Tests for the OPTIONAL real maf2sam (--real; the reference's maf2sam
is a stub that ignores its input, converter.rs:94-125 -- stub parity is
covered in test_tools.py)."""

import io

from wgatools_tpu.io.maf import MafReader
from wgatools_tpu.tools.convert import maf2sam


def _reader(buf: str) -> MafReader:
    return MafReader(io.BytesIO(buf.encode()))


MAF = (
    "##maf version=1.6\n"
    "a score=0\n"
    "s\tref.chr1\t100\t10\t+\t1000\tACGTA-CGTAC\n"
    "s\tqry.chr1\t5\t11\t+\t500\tACCTAGCG-AC\n\n"
    "a score=0\n"
    "s\tref.chr2\t50\t4\t+\t2000\tACGT\n"
    "s\tqry.chr2\t7\t4\t-\t400\tACGT\n\n"
)


def test_maf2sam_real_fields():
    out = io.BytesIO()
    maf2sam(_reader(MAF), out, real=True)
    lines = out.getvalue().decode().splitlines()
    hdr = [l for l in lines if l.startswith("@")]
    body = [l for l in lines if not l.startswith("@")]
    assert hdr[0] == "@HD\tVN:1.6\tSO:unsorted"
    assert "@SQ\tSN:ref.chr1\tLN:1000" in hdr
    assert "@SQ\tSN:ref.chr2\tLN:2000" in hdr
    assert any(l.startswith("@PG\tID:wgatools-tpu") for l in body + hdr)
    assert len(body) == 2

    f = body[0].split("\t")
    # qname, flag, rname, 1-based pos, mapq
    assert f[:5] == ["qry.chr1", "0", "ref.chr1", "101", "255"]
    # columns: 5M 1I(ref gap) 2M 1D(query gap) 2M -> SAM M/I/D with
    # hard clips from the query frame: lead 5, trail 500-5-11=484
    assert f[5] == "5H5M1I2M1D2M484H"
    assert f[9] == "ACCTAGCGAC"  # gap-stripped query row
    # NM = X runs (1: C vs G at col 3? check) + I + D sizes
    # cols: A=A C=C G/C X T=T A=A -/G I C=C G=G T/- D A=A C=C
    assert f[11] == "NM:i:3"

    f2 = body[1].split("\t")
    assert f2[1] == "16"  # negative strand
    assert f2[3] == "51"
    # clips are in SEQ (target-forward) orientation: the strand-frame
    # head clip (7) is the read's target-forward TAIL for FLAG 16
    # (round-5 review fix)
    assert f2[5] == "389H4M7H"


def test_maf2sam_stub_unchanged_by_default():
    out = io.BytesIO()
    maf2sam(_reader(MAF), out, real=False)
    assert out.getvalue().startswith(b"@HD\tVN:1.6\tSO:unsorted\n@SQ\tSN:sq0")
    assert b"noodles" in out.getvalue()


def test_maf2sam_real_cli(tmp_path):
    import subprocess

    p = tmp_path / "x.maf"
    p.write_text(MAF)
    res = subprocess.run(
        ["python", "-m", "wgatools_tpu", "maf2sam", str(p), "--real"],
        capture_output=True, check=True,
    )
    assert b"@SQ\tSN:ref.chr1" in res.stdout
    assert b"qry.chr1\t0\tref.chr1\t101\t255\t" in res.stdout


def test_maf2sam_real_gapgap_columns_dropped():
    """gap/gap columns exist in neither coordinate frame; they must not
    inflate M runs (CIGAR query-length consistency) or the target span
    (round-5 review finding)."""
    maf = (
        "##maf version=1.6\n"
        "a score=0\n"
        "s\tref\t10\t4\t+\t100\tAC--GT\n"
        "s\tqry\t0\t4\t+\t200\tAC--GT\n\n"
    )
    out = io.BytesIO()
    maf2sam(_reader(maf), out, real=True)
    body = [
        l for l in out.getvalue().decode().splitlines()
        if not l.startswith("@")
    ]
    f = body[0].split("\t")
    # 4 aligned bases -> 4M (plus 196H trailing clip), SEQ length 4
    assert f[5] == "4M196H"
    assert f[9] == "ACGT"
    # CIGAR/SEQ consistency: sum(M+I) == len(SEQ)
    import re

    consumed = sum(
        int(n) for n, op in re.findall(r"(\d+)([MIDH])", f[5])
        if op in ("M", "I")
    )
    assert consumed == len(f[9])


def test_maf2sam_real_all_gap_query_seq_star():
    """A query row with no aligned bases must render SEQ as '*' -- an
    empty mandatory column is malformed SAM (round-5 review finding)."""
    maf = (
        "##maf version=1.6\n"
        "a score=0\n"
        "s\tref\t10\t4\t+\t100\tACGT\n"
        "s\tqry\t0\t0\t+\t200\t----\n\n"
    )
    out = io.BytesIO()
    maf2sam(_reader(maf), out, real=True)
    body = [
        l for l in out.getvalue().decode().splitlines()
        if not l.startswith("@")
    ]
    f = body[0].split("\t")
    assert f[9] == "*"
    assert len(f) >= 11  # no empty-column collapse
