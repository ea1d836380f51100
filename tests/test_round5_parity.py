"""Round-5 parity review regressions: reference-quirk reproduction and
clean-error behavior on malformed inputs (see PARITY.md and the cited
reference lines in each fixed function)."""

import io

import numpy as np
import pytest

from wgatools_tpu.errors import (
    ParseGenomeRegionError,
    ParseIntError,
    ParsePafError,
    WGAError,
)
from wgatools_tpu.core import cigar as C
from wgatools_tpu.io.chain import ChainReader
from wgatools_tpu.io.maf import parse_sline
from wgatools_tpu.io.paf import parse_paf_line


def _tok(cg):
    return C.tokenize_cigar(cg)


def test_zero_length_m_chain_lines_match_reference():
    """cigar_unit_chain gates the flush on size != 0 AND resets diffs on
    every M (cigar.rs:467-477): '10M3I0M4I2M' emits (10,0,3) and DROPS
    the 4I; no (0,0,4) line."""
    ops, lens = _tok("10M3I0M4I2M")
    sizes, qds, tds, final = C.chain_line_arrays_from_ops(ops, lens)
    assert sizes.tolist() == [10]
    assert qds.tolist() == [0]
    assert tds.tolist() == [3]
    assert final == 2
    # oracle agreement (tests/reference_impl.py mirrors the Rust fold)
    import reference_impl as ref

    lines, fin = ref.chain_lines([("M", 10), ("I", 3), ("M", 0),
                                  ("I", 4), ("M", 2)])
    assert lines == [(10, 0, 3)] and fin == 2
    # native fused text path agrees byte-for-byte
    from wgatools_tpu import native

    if native.available():
        res = native.cigar_text_to_chain_block(b"10M3I0M4I2M")
        assert res[0] == b"\n10\t0\t3"
        assert res[5] == 2  # final size


def test_zero_length_m_leading_drops_diffs():
    """'0M5I10M': the 5I accumulates as a diff (post-first-M) and is
    dropped at the next M because size == 0 blocks the flush."""
    ops, lens = _tok("0M5I10M")
    sizes, qds, tds, final = C.chain_line_arrays_from_ops(ops, lens)
    assert sizes.tolist() == [] and final == 10
    from wgatools_tpu import native

    if native.available():
        res = native.ops_to_chain_block(ops, np.asarray(lens, np.int64))
        assert res[0] == b"" and res[5] == 10


def test_chain_unterminated_final_line_dropped():
    """The reference requires newline-TERMINATED data lines
    (line_not_chain, chain.rs:325-326); a final line with no trailing
    newline is silently discarded -- quirk reproduced."""
    data = (
        b"chain\t255\tt\t100\t+\t0\t50\tq\t100\t+\t0\t50\t1\n"
        b"10\t5\t5\n"
        b"5"
    )
    recs = list(ChainReader(io.BytesIO(data)).records())
    assert len(recs) == 1
    assert recs[0].sizes.tolist() == [10]  # the bare '5' is gone
    # terminated variant keeps it
    recs = list(ChainReader(io.BytesIO(data + b"\n")).records())
    assert recs[0].sizes.tolist() == [10, 5]


def test_mismatched_row_lengths_zip_to_min():
    """The reference's per-column folds iterate seq1.zip(seq2), stopping
    at the shorter row (cigar.rs:344-432); both engines mirror it
    instead of overreading (native) or broadcast-crashing (numpy)."""
    t = C.seq_bytes(b"ACGTACGTACGT")
    q = C.seq_bytes(b"ACGT")
    cig = C.cigar_from_seqs(t, q, negative=False)
    assert cig.cigar_string == "4="
    vals, lens = C.ext_runs(t, q)
    assert np.asarray(lens).sum() == 4


def test_insert_gaps_reference_insert_into_copy_semantics():
    """parse_cigar_to_insert inserts gaps into COPIES of the raw
    sequences (cigar.rs:492-551): no byte is ever read from a source, so
    a pure-M CIGAR returns the sources unchanged whatever their length;
    an I/D insert whose offset passes the current end is the one case
    the reference panics on -> WGAError here (round-5 review finding:
    both engines previously fabricated bytes by repeating the last
    base)."""
    # pure-M never panics: sources pass through untouched
    assert C.insert_gaps_by_ops(*_tok("5M"), b"AC", b"GGGGG") == (
        b"AC",
        b"GGGGG",
    )
    # longer source keeps its tail after the inserted gap run
    tg, qg = C.insert_gaps_by_ops(*_tok("2M1I"), b"ACGT", b"GGG")
    assert tg == b"AC-GT" and qg == b"GGG"
    # shorter source: gap run at the op-frame offset, row ends early
    tg, qg = C.insert_gaps_by_ops(*_tok("2M3I"), b"AC", b"GGGGG")
    assert tg == b"AC---" and qg == b"GGGGG"
    # insert past the current end -> reference panic -> WGAError
    with pytest.raises(WGAError):
        C.insert_gaps_by_ops(*_tok("5M3I"), b"AC", b"GGGGGGGG")
    with pytest.raises(WGAError):
        C.insert_gaps_by_ops(*_tok("5M3D"), b"ACGTACGT", b"GG")
    # exact-length hot path (native) still byte-identical
    tg, qg = C.insert_gaps_by_ops(*_tok("2M1I2D1M"), b"ACGTA", b"GGGG")
    assert tg == b"AC-GTA" and qg == b"GGG--G"


def test_strict_u64_grammar():
    """Rust u64::from_str: optional leading '+', ASCII digits only --
    '1_000', unicode digits, and negatives all error."""
    good = parse_paf_line(
        "q\t+10\t0\t5\t+\tt\t10\t0\t5\t5\t5\t255\tcg:Z:5M"
    )
    assert good.query_length == 10
    for bad in ("1_000", "-5", "١٢", "0x10"):
        with pytest.raises(ParsePafError):
            parse_paf_line(
                f"q\t{bad}\t0\t5\t+\tt\t10\t0\t5\t5\t5\t255\tcg:Z:5M"
            )
    with pytest.raises(ParseIntError):
        parse_sline(b"s\tref\t1_0\t4\t+\t100\tACGT")
    data = b"chain\t255\tt\t100\t+\t0\t50\tq\t100\t+\t0\t-50\t1\n50\n\n"
    with pytest.raises(WGAError):
        list(ChainReader(io.BytesIO(data)).records())


def test_chain_negative_data_line_both_engines():
    """A negative data-line token errors identically with and without
    the native library (host-path parity)."""
    from wgatools_tpu.io.chain import _parse_block

    with pytest.raises(WGAError):
        _parse_block(b"-10\t5\t5\n10\n")


def test_region_file_clean_errors():
    from wgatools_tpu.io.regions import read_region_file

    with pytest.raises(ParseGenomeRegionError):
        read_region_file(io.BytesIO(b"chr1\tfoo\t100\n"))
    with pytest.raises(ParseGenomeRegionError):
        read_region_file(io.BytesIO(b"chr1\t-5\t100\n"))
    regs = read_region_file(io.BytesIO(b"chr1\t5\t100\n"))
    assert regs[0].start == 5 and regs[0].end == 100


def test_split_call_plans_from_selected_query():
    """_call_split_record must select the query row BEFORE computing the
    SV-safe chunk plan (round-5 review finding): planning from the
    default slines[1] could split a cutoff-size gap run of the selected
    query mid-run, changing emitted SVs vs the serial tool."""
    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.parallel.host_pool import _call_split_record
    from wgatools_tpu.tools.caller import call_record_part

    # q1: no gaps at all; q2: one 6-gap deletion run mid-record
    t = "ACGTACGTACGTACGTACGTACGTACGT"
    q1 = "ACGTACGTACGTACGTACGTACGTACGT"
    q2 = "ACGTACGTAC------GTACGTACGTAC"
    maf = (
        "##maf version=1.6\n"
        "a score=0\n"
        f"s\tref\t0\t28\t+\t100\t{t}\n"
        f"s\tqA\t0\t28\t+\t100\t{q1}\n"
        f"s\tqB\t0\t22\t+\t100\t{q2}\n\n"
    )
    params = (True, True, 0, 8, "qB", None)  # chunk_size 8 < run span
    rec = MafReader(io.BytesIO(maf.encode())).next_record()
    parts = _call_split_record(rec, 3, params)
    rec2 = MafReader(io.BytesIO(maf.encode())).next_record()
    serial = io.BytesIO()
    call_record_part(rec2, serial, True, True, 0, 8, "qB", None)
    assert b"".join(parts) == serial.getvalue()


def test_dotplot_zero_span_identity_is_nan():
    """Rust f64 division never raises (dotplot.rs:416-423): a zero-span
    record gets identity NaN, not a ZeroDivisionError abort."""
    import math

    from wgatools_tpu.io.paf import parse_paf_line
    from wgatools_tpu.tools.dotplot import _overview_row

    rec = parse_paf_line(
        "q\t10\t0\t0\t+\tt\t10\t5\t5\t0\t0\t255\tcg:Z:"
    )
    row = _overview_row(rec, no_identity=False)
    assert math.isnan(row["identity"])


def test_maf2sam_real_negative_strand_clips_swap():
    """SAM stores SEQ target-forward (FLAG 16), so the MAF query row's
    strand-frame head clip is the read's target-forward TAIL clip
    (round-5 review finding)."""
    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.tools.convert import maf2sam

    maf = (
        "##maf version=1.6\n"
        "a score=0\n"
        "s\tref\t10\t4\t+\t100\tACGT\n"
        "s\tqry\t7\t4\t-\t50\tACGT\n\n"
    )
    out = io.BytesIO()
    maf2sam(MafReader(io.BytesIO(maf.encode())), out, real=True)
    body = [
        l for l in out.getvalue().decode().splitlines()
        if not l.startswith("@")
    ]
    f = body[0].split("\t")
    assert f[1] == "16"
    # strand-frame: lead 7, trail 50-7-4=39 -> target-forward: 39H...7H
    assert f[5] == "39H4M7H"


def test_forked_map_surfaces_worker_traceback(capfd):
    from wgatools_tpu.parallel.host_pool import forked_map

    def boom(x):
        if x == 1:
            raise ValueError("worker exploded")
        return x

    with pytest.raises(RuntimeError, match="traceback is on stderr"):
        forked_map(boom, [0, 1])
    assert "worker exploded" in capfd.readouterr().err


def test_followup_review_regressions():
    """Round-5 follow-up review: device-path zip parity, mid-file
    unterminated chain lines, windowed fork pool, u64 grammar edges."""
    # pack_pairs truncates mismatched rows like the host zip (no crash)
    from wgatools_tpu.ops.classify import pack_pairs

    t_arr, q_arr, lengths = pack_pairs([(b"ACGTAC", b"ACG")])
    assert lengths.tolist() == [3]
    assert t_arr[0, :3].tobytes() == b"ACG"
    # mid-file unterminated data line abutting the next header drops
    data = (
        b"chain\t255\tt\t100\t+\t0\t50\tq\t100\t+\t0\t50\t1\n"
        b"10\t0\t0\n"
        b"60chain\t255\tt\t100\t+\t0\t50\tq\t100\t+\t0\t50\t2\n"
        b"10\n\n"
    )
    recs = list(ChainReader(io.BytesIO(data)).records())
    assert [r.sizes.tolist() for r in recs] == [[10], [10]]
    # windowed fork pool keeps order and bounds concurrency
    from wgatools_tpu.parallel.host_pool import forked_map

    assert forked_map(lambda x: x * x, list(range(7)), limit=2) == [
        x * x for x in range(7)
    ]
    # '+5' region coordinates parse (Rust u64 grammar)
    from wgatools_tpu.io.regions import read_region_file

    regs = read_region_file(io.BytesIO(b"chr1\t+5\t10\n"))
    assert regs[0].start == 5
    # >= 2^64 coordinates error in maf/paf like the chain parser
    with pytest.raises(ParseIntError):
        parse_sline(b"s\tref\t18446744073709551616\t4\t+\t100\tACGT")
    with pytest.raises(ParsePafError):
        parse_paf_line(
            "q\t18446744073709551616\t0\t5\t+\tt\t10\t0\t5\t5\t5\t255"
            "\tcg:Z:5M"
        )
