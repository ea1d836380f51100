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
