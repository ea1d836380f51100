"""Differential tests for the native dotplot row pipeline.

Three layers must agree byte-for-byte with the pure-Python dict path
(base_plotdata_from_runs):
  1. plot_segments      (C++ state machine -> columnar PlotSegs)
  2. format_plotdata_*  (columnar -> serde_json / csv rows)
  3. cigar_text_to_plotdata (fully fused text -> rows)
"""

import io as _io
import random

import numpy as np
import pytest

from wgatools_tpu import native
from wgatools_tpu.core.fmt import dumps_serde
from wgatools_tpu.io.paf import PafRecord
from wgatools_tpu.tools.dotplot import (
    BASE_FIELDS,
    _csv_cell,
    _FusedRowEmitter,
    _values_json,
    base_plotdata_from_runs,
    base_plotdata_segments,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _random_case(seed):
    rng = random.Random(seed)
    n = rng.randint(0, 60)
    ops, runs = [], []
    for _ in range(n):
        op = rng.choice("M=XID")
        ln = rng.choice([1, 2, 3, 7, 49, 50, 51, 200])
        ops.append(op)
        runs.append((op, ln))
    negative = rng.random() < 0.5
    cutoff = rng.choice([0, 3, 50])
    return runs, negative, cutoff


class _Rec:
    def __init__(self, negative):
        from wgatools_tpu.core.strand import Strand

        self.target_start = 1000
        self.query_start = 2000
        self.target_name = "ref.chr1"
        self.query_name = 'q"uery,é'  # quoting + non-ASCII stress
        self.query_strand = Strand.NEGATIVE if negative else Strand.POSITIVE


@pytest.mark.parametrize("seed", range(40))
def test_plot_segments_matches_python(seed):
    runs, negative, cutoff = _random_case(seed)
    rec = _Rec(negative)
    want = base_plotdata_from_runs(runs, rec, cutoff)
    ops = np.frombuffer(
        "".join(op for op, _ in runs).encode(), dtype=np.uint8
    )
    lens = np.array([ln for _, ln in runs], dtype=np.int64)
    segs = base_plotdata_segments(ops, lens, rec, cutoff)
    assert segs.rows() == want


@pytest.mark.parametrize("seed", range(20))
@pytest.mark.parametrize("csv", [False, True])
def test_row_formatters_match_dict_path(seed, csv):
    runs, negative, cutoff = _random_case(seed)
    rec = _Rec(negative)
    rows = base_plotdata_from_runs(runs, rec, cutoff)
    ops = np.frombuffer(
        "".join(op for op, _ in runs).encode(), dtype=np.uint8
    )
    lens = np.array([ln for _, ln in runs], dtype=np.int64)
    segs = base_plotdata_segments(ops, lens, rec, cutoff)
    if csv:
        import json as _json

        blob = native.format_plotdata_csv(
            segs.rs, segs.re, segs.qs, segs.qe, segs.cg,
            _csv_cell(rec.target_name).encode("utf-8"),
            _csv_cell(rec.query_name).encode("utf-8"),
        )
        want = "".join(
            ",".join(_csv_cell(r[f]) for f in BASE_FIELDS) + "\n"
            for r in rows
        ).encode("utf-8")
        assert blob == want
    else:
        got = _values_json(segs.rows()).text  # dict path
        want = _values_json([segs]).text  # native columnar path
        assert got == want
        assert got == "[" + ",".join(dumps_serde(r) for r in rows) + "]"


def _paf_line(runs, negative, rec):
    tl = sum(ln for op, ln in runs if op in "M=XD")
    ql = sum(ln for op, ln in runs if op in "M=XI")
    cg = "".join(f"{ln}{op}" for op, ln in runs)
    return (
        f"{rec.query_name}\t{rec.query_start + ql + 10}\t{rec.query_start}\t"
        f"{rec.query_start + ql}\t{'-' if negative else '+'}\t"
        f"{rec.target_name}\t{rec.target_start + tl + 10}\t"
        f"{rec.target_start}\t{rec.target_start + tl}\t1\t{max(1, tl)}\t60\t"
        f"cg:Z:{cg}"
    )


@pytest.mark.parametrize("seed", range(20))
@pytest.mark.parametrize("out_format", ["json", "csv"])
def test_fused_emitter_matches_bundles(seed, out_format):
    from wgatools_tpu.io.paf import parse_paf_line

    runs, negative, cutoff = _random_case(seed)
    if not runs:
        runs = [("M", 5)]
    recproto = _Rec(negative)
    recproto.query_name = "q1"  # PAF name: no tabs
    rec = parse_paf_line(_paf_line(runs, negative, recproto))
    emit = _FusedRowEmitter(out_format, cutoff)
    raw1 = emit(rec)
    raw2 = emit(rec)  # second record exercises lead_comma

    ops, lens = rec.get_cigar_ops()
    segs = base_plotdata_segments(ops, lens, rec, cutoff)
    if out_format == "csv":
        want = native.format_plotdata_csv(
            segs.rs, segs.re, segs.qs, segs.qe, segs.cg,
            _csv_cell(rec.target_name).encode(),
            _csv_cell(rec.query_name).encode(),
        )
        assert raw1.blob == want and raw2.blob == want
    else:
        want = _values_json([segs, segs]).text
        got = "[" + (raw1.blob + raw2.blob).decode() + "]"
        assert got == want


def test_fused_emitter_tokenize_error():
    from wgatools_tpu.errors import CigarOpInvalid, ParseIntError
    from wgatools_tpu.io.paf import parse_paf_line

    # unknown op chars are IGNORED, matching the dict-path walk
    # (base_plotdata_from_runs has no else branch) -- not an error
    rec = parse_paf_line(
        "q\t100\t0\t50\t+\tt\t100\t0\t50\t50\t50\t60\tcg:Z:10M5Q"
    )
    ops, lens = rec.get_cigar_ops()
    segs = base_plotdata_segments(ops, lens, rec, 0)
    got = _FusedRowEmitter("json", 0)(rec)
    assert "[" + got.blob.decode() + "]" == _values_json([segs]).text

    # malformed numeric token -> same error type as the tokenize path
    rec = parse_paf_line(
        "q\t100\t0\t50\t+\tt\t100\t0\t50\t50\t50\t60\tcg:Z:10M5"
    )
    with pytest.raises((ParseIntError, CigarOpInvalid)):
        _FusedRowEmitter("json", 0)(rec)
