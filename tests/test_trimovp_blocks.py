"""Tests for the OPTIONAL trimovp + paf2blocks extras (dead code in the
reference -- tools/trimovp.rs and converter.rs:128-145 are fully
commented out; semantics reproduced per-rule with deterministic
ordering, see PARITY.md)."""

import io

import pytest

from wgatools_tpu.errors import CigarOpInvalid
from wgatools_tpu.io.paf import PafReader
from wgatools_tpu.tools.convert import paf2blocks
from wgatools_tpu.tools.trimovp import trim_ovp


def _paf_line(q, t, ts, te, tags=("cg:Z:10M",)):
    span = te - ts
    fields = [q, "500", "0", str(span), "+", t, "1000", str(ts), str(te),
              str(span), str(span), "60", *tags]
    return "\t".join(fields) + "\n"


def _run_trim(lines):
    out = io.BytesIO()
    trim_ovp(PafReader(io.BytesIO("".join(lines).encode())), out)
    return out.getvalue().decode().splitlines()


def _tspans(rows):
    return [(r.split("\t")[7], r.split("\t")[8]) for r in rows]


def test_trimovp_emit_on_gap_then_final():
    # sweep trimovp.rs:58-78: non-overlapping successor emits the
    # candidate; the final candidate always emits
    rows = _run_trim([
        _paf_line("q1", "t1", 0, 100),
        _paf_line("q1", "t1", 110, 300),
    ])
    assert _tspans(rows) == [("0", "100"), ("110", "300")]


def test_trimovp_overlap_keeps_longest():
    # overlapping shorter record is dropped (trimovp.rs:72-75);
    # overlapping longer record replaces the candidate (69-71)
    rows = _run_trim([
        _paf_line("q1", "t1", 0, 100),
        _paf_line("q1", "t1", 50, 120),   # span 70 < 100: dropped
    ])
    assert _tspans(rows) == [("0", "100")]
    rows = _run_trim([
        _paf_line("q1", "t1", 0, 100),
        _paf_line("q1", "t1", 50, 250),   # span 200 > 100: replaces
    ])
    assert _tspans(rows) == [("50", "250")]


def test_trimovp_sorts_by_target_start_within_group():
    # binary-search insertion order == sort by target_start
    # (trimovp.rs:45-48)
    rows = _run_trim([
        _paf_line("q1", "t1", 110, 300),
        _paf_line("q1", "t1", 0, 100),
    ])
    assert _tspans(rows) == [("0", "100"), ("110", "300")]


def test_trimovp_groups_do_not_interact():
    # same spans under different (target, query) keys all survive;
    # groups emit in first-seen order (deterministic divergence from
    # the reference's HashMap order, PARITY.md)
    rows = _run_trim([
        _paf_line("q1", "t1", 0, 100),
        _paf_line("q2", "t1", 50, 120),
        _paf_line("q1", "t2", 60, 90),
    ])
    assert [(r.split("\t")[0], r.split("\t")[5]) for r in rows] == [
        ("q1", "t1"), ("q2", "t1"), ("q1", "t2"),
    ]


def test_trimovp_roundtrip_bytes():
    # surviving records re-serialize byte-identically (csv serialize of
    # PafRecord == PAF row, trimovp.rs:50-53)
    line = _paf_line("q1", "t1", 3, 40, tags=("cg:Z:37M", "NM:i:0"))
    assert _run_trim([line]) == [line.rstrip("\n")]


def _run_blocks(lines):
    out = io.BytesIO()
    paf2blocks(PafReader(io.BytesIO("".join(lines).encode())), out)
    return out.getvalue().decode().splitlines()


def test_paf2blocks_header_and_rows():
    # Block field-name header (converter.rs:133-135, common.rs:73-81);
    # M emits and collapses, I advances query, D advances target
    # (cigar.rs:88-110); '='/'X' are M-like (working-tool divergence,
    # PARITY.md)
    fields = ["q1", "500", "5", "19", "+", "t1", "1000", "10", "23",
              "14", "16", "60", "cg:Z:4=2X3I2D5M"]
    rows = _run_blocks(["\t".join(fields) + "\n"])
    assert rows[0] == (
        "query_name\tquery_start\tquery_end"
        "\ttarget_name\ttarget_start\ttarget_end\tstrand"
    )
    assert rows[1:] == [
        "q1\t5\t9\tt1\t10\t14\t+",
        "q1\t9\t11\tt1\t14\t16\t+",
        "q1\t14\t19\tt1\t18\t23\t+",
    ]


def test_paf2blocks_negative_strand_renders_dash():
    fields = ["q1", "500", "0", "4", "-", "t1", "1000", "0", "4",
              "4", "4", "60", "cg:Z:4M"]
    rows = _run_blocks(["\t".join(fields) + "\n"])
    assert rows[1] == "q1\t0\t4\tt1\t0\t4\t-"


def test_paf2blocks_rejects_foreign_ops():
    # the dead code errors on ops outside M/I/D (cigar.rs:111-119);
    # we extend the allowed set only by '='/'X'
    fields = ["q1", "500", "0", "4", "+", "t1", "1000", "0", "4",
              "4", "4", "60", "cg:Z:4S"]
    with pytest.raises(CigarOpInvalid):
        _run_blocks(["\t".join(fields) + "\n"])


def test_extras_cli(tmp_path):
    import subprocess

    p = tmp_path / "x.paf"
    p.write_text(_paf_line("q1", "t1", 0, 100)
                 + _paf_line("q1", "t1", 50, 120))
    res = subprocess.run(
        ["python", "-m", "wgatools_tpu", "trimovp", str(p)],
        capture_output=True, check=True,
    )
    assert len(res.stdout.decode().splitlines()) == 1
    res = subprocess.run(
        ["python", "-m", "wgatools_tpu", "p2b", str(p)],
        capture_output=True, check=True,
    )
    lines = res.stdout.decode().splitlines()
    assert lines[0].startswith("query_name\t") and len(lines) == 3
