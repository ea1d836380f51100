"""Parser robustness: malformed inputs raise WGAError, never raw
IndexError/ValueError/UnboundLocal (reference error surface:
src/errors.rs)."""

import io
import random

import pytest

from wgatools_tpu.errors import WGAError
from wgatools_tpu.io.chain import ChainReader
from wgatools_tpu.io.maf import MafReader
from wgatools_tpu.io.paf import PafReader

MAF_OK = (
    b"#maf version=1.6\n"
    b"a score=0\n"
    b"s\tt\t0\t4\t+\t10\tACGT\n"
    b"s\tq\t0\t4\t+\t10\tACGT\n\n"
)

BAD_MAFS = [
    b"#\ns\tt\t0\t4\n",                        # missing fields
    b"#\ns\tt\tx\t4\t+\t10\tACGT\n",           # non-integer start
    b"#\ns\tt\t0\t4\t?\t10\tACGT\n",           # bad strand
    b"#\ns\tt\t0\t4\t+\t10\tACGT\textra\n",    # surplus field
]

BAD_PAFS = [
    b"q\t10\t0\t5\t+\tt\t10\t0\t5\t5\n",       # 10 fields
    b"q\tx\t0\t5\t+\tt\t10\t0\t5\t5\t5\t255\n",  # non-integer
    b"q\t10\t0\t5\t*\tt\t10\t0\t5\t5\t5\t255\n",  # bad strand
]

BAD_CHAINS = [
    b"chain\t255\tt\t100\n",                   # short header
    b"chain\t255\tt\t100\t+\t0\t50\tq\t100\t+\t0\t50\t1\nxx\n",  # bad line
]


@pytest.mark.parametrize("data", BAD_MAFS)
def test_bad_maf_raises_wgaerror(data):
    with pytest.raises(WGAError):
        list(MafReader(io.BytesIO(data)).records())


@pytest.mark.parametrize("data", BAD_PAFS)
def test_bad_paf_raises_wgaerror(data):
    with pytest.raises(WGAError):
        list(PafReader(io.BytesIO(data)).records())


@pytest.mark.parametrize("data", BAD_CHAINS)
def test_bad_chain_raises_wgaerror(data):
    with pytest.raises(WGAError):
        list(ChainReader(io.BytesIO(data)).records())


@pytest.mark.parametrize("seed", range(20))
def test_maf_fuzz_mutations(seed):
    """Random byte mutations either parse or raise WGAError."""
    rng = random.Random(seed)
    data = bytearray(MAF_OK)
    for _ in range(rng.randint(1, 6)):
        pos = rng.randrange(len(data))
        data[pos] = rng.randrange(256)
    try:
        for rec in MafReader(io.BytesIO(bytes(data))).records():
            rec.get_stat()
    except WGAError:
        pass
    except UnicodeDecodeError:
        pass  # non-ascii bytes in numeric fields surface as parse failures


@pytest.mark.parametrize("seed", range(20))
def test_paf_fuzz_mutations(seed):
    rng = random.Random(seed)
    base = bytearray(
        b"q\t10\t0\t5\t+\tt\t10\t0\t5\t5\t5\t255\tcg:Z:3M1I1M\n"
    )
    for _ in range(rng.randint(1, 5)):
        pos = rng.randrange(len(base))
        base[pos] = rng.randrange(256)
    try:
        for rec in PafReader(io.BytesIO(bytes(base))).records():
            rec.get_stat()
    except WGAError:
        pass
    except UnicodeDecodeError:
        pass


def test_empty_inputs():
    assert list(MafReader(io.BytesIO(b"")).records()) == []
    assert list(PafReader(io.BytesIO(b"")).records()) == []
    assert list(ChainReader(io.BytesIO(b"")).records()) == []
    # comments / blank lines only
    assert list(PafReader(io.BytesIO(b"# hi\n\n")).records()) == []


def test_natsort_ascii_digits_only():
    """natord only treats ASCII 0-9 as digits; Unicode digits ('²') must not
    reach int() (ADVICE r1)."""
    from wgatools_tpu.core.natsort import natural_cmp, natural_key

    assert natural_cmp("chr²a", "chr²b") == -1
    assert natural_cmp("chr2", "chr10") == -1
    # superscript-two sorts by ordinal, not numeric value
    assert sorted(["chr²", "chr3"], key=natural_key) == ["chr3", "chr²"]


def test_cigar_length_overflow_raises():
    """A 20+ digit op length must raise ParseIntError, not wrap int64
    (reference parse_str2u64 returns ParseIntError; ADVICE r1)."""
    import pytest

    from wgatools_tpu.core.cigar import tokenize_cigar
    from wgatools_tpu.errors import WGAError

    with pytest.raises(WGAError):
        tokenize_cigar("99999999999999999999999M")
    ops, lens = tokenize_cigar("9223372036854775807M")  # INT64_MAX is fine
    assert lens[0] == 9223372036854775807


def test_chain_score_fmt_positional():
    """Rust f64 Display never uses exponent notation (ADVICE r1)."""
    from wgatools_tpu.io.chain import fmt_f64

    assert fmt_f64(1e20) == "100000000000000000000"
    assert fmt_f64(1e-7) == "0.0000001"
    assert fmt_f64(255.0) == "255"
    assert fmt_f64(3.5) == "3.5"
    assert fmt_f64(-0.25) == "-0.25"


@pytest.mark.parametrize("seed", range(20))
def test_chain_fuzz_mutations(seed):
    """Random byte mutations in a chain file either parse or raise
    WGAError; whatever parses must survive convert2paf."""
    rng = random.Random(seed)
    base = bytearray(
        b"chain\t255\tt\t100\t+\t0\t50\tq\t100\t+\t0\t48\t1\n"
        b"10\t2\t0\n20\t0\t2\n16\n\n"
        b"chain\t10\tt2\t60\t+\t5\t35\tq2\t60\t-\t10\t40\t2\n"
        b"30\n\n"
    )
    for _ in range(rng.randint(1, 6)):
        pos = rng.randrange(len(base))
        base[pos] = rng.randrange(256)
    try:
        for rec in ChainReader(io.BytesIO(bytes(base))).records():
            rec.convert2paf().to_row()
    except WGAError:
        pass
    except UnicodeDecodeError:
        pass


# -- fused native chain-cigar paths ----------------------------------------


def _random_chain_block(rng):
    lines = []
    for _ in range(rng.randint(0, 8)):
        size = rng.choice([0, 1, 7, 123, 10**12])
        dq = rng.choice([0, 0, 3, 50])
        dt = rng.choice([0, 0, 2, 99])
        fields = [str(size)]
        if rng.random() < 0.8:
            fields.append(str(dq))
            if rng.random() < 0.9:
                fields.append(str(dt))
        sep = rng.choice(["\t", " ", "  "])
        lines.append(sep.join(fields))
        if rng.random() < 0.2:
            lines.append("")  # blank line
    return ("\n".join(lines) + rng.choice(["", "\n"])).encode()


@pytest.mark.parametrize("seed", range(10))
def test_chain_to_cigar_fused_vs_eager(seed):
    """ChainRecord.to_cigar must be identical through all three paths:
    fused text (native), fused arrays (native), and the pure-python
    fallback over eagerly parsed arrays."""
    from wgatools_tpu import native
    from wgatools_tpu.io.chain import ChainRecord, _parse_block

    if not native.available():
        pytest.skip("native library unavailable")
    rng = random.Random(seed)
    block = _random_chain_block(rng)
    cols = _parse_block(block)
    lazy = ChainRecord(block=block)
    eager = ChainRecord(**cols)
    a, b = lazy.to_cigar(), eager.to_cigar()
    assert a.cigar_string == b.cigar_string
    for f in ("match_count", "ins_event", "ins_count", "del_event",
              "del_count"):
        assert getattr(a, f) == getattr(b, f), f
    # wrapper-level agreement too
    fused = native.chain_text_to_cg(block)
    arrays = native.chain_arrays_to_cg(cols["sizes"], cols["dqs"],
                                       cols["dts"])
    assert fused == arrays
    assert native.validate_chain_lines(block) == len(cols["sizes"])


def test_validate_chain_lines_error_position():
    from wgatools_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    bad = b"10\t2\t3\n4\tx\n"
    with pytest.raises(ValueError) as e1:
        native.validate_chain_lines(bad)
    with pytest.raises(ValueError) as e2:
        native.parse_chain_lines(bad)
    with pytest.raises(ValueError) as e3:
        native.chain_text_to_cg(bad)
    assert e1.value.args[0] == e2.value.args[0] == e3.value.args[0] == 9


@pytest.mark.parametrize("seed", range(12))
def test_ops_to_chain_block_vs_numpy(seed):
    """Fused native ops->chain-block must equal trims_from_ops +
    chain_line_arrays_from_ops + format_chain_lines, including no-M,
    leading/trailing indel, and zero-length-M edge cases."""
    import numpy as np

    from wgatools_tpu import native
    from wgatools_tpu.core import cigar as C

    if not native.available():
        pytest.skip("native library unavailable")
    rng = random.Random(seed)
    cases = {
        0: b"",            # empty
        1: b"IDID",        # no M at all
        2: b"I" * 3,       # no M, one op type
        3: b"MIM",         # simple
        4: b"IIMMDDMII",   # head + tail trims, zero-gap merge
    }
    if seed in cases:
        ops = np.frombuffer(cases[seed], dtype=np.uint8)
        lens = np.array(
            [rng.choice([0, 1, 5, 10**11]) for _ in range(len(ops))],
            dtype=np.int64,
        )
    else:
        n = rng.randint(1, 40)
        ops = np.frombuffer(
            bytes(rng.choice(b"M=XID") for _ in range(n)), dtype=np.uint8
        )
        lens = np.array(
            [rng.choice([0, 1, 2, 7, 500]) for _ in range(n)],
            dtype=np.int64,
        )
    got = native.ops_to_chain_block(ops, lens)
    assert got is not None
    text, hi, hd, ti, td, final = got
    want_trims = C.trims_from_ops(ops, lens)
    assert (hi, hd, ti, td) == want_trims
    sizes, dqs, dts, want_final = C.chain_line_arrays_from_ops(ops, lens)
    assert final == want_final
    want_text = native.format_chain_lines(sizes, dqs, dts)
    assert text == want_text


def test_ops_to_chain_block_invalid_op():
    import numpy as np

    from wgatools_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    ops = np.frombuffer(b"MSM", dtype=np.uint8)
    lens = np.ones(3, dtype=np.int64)
    with pytest.raises(ValueError) as e:
        native.ops_to_chain_block(ops, lens)
    assert e.value.args[0] == "S"


def test_crlf_line_endings():
    """CRLF inputs parse like the reference (Rust lines() keeps the \\r,
    split_whitespace absorbs it): seq fields must come out \\r-free."""
    import io as iolib

    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.io.paf import PafReader

    maf = (
        b"##maf version=1.6\r\na score=0\r\n"
        b"s\tref.c\t0\t4\t+\t100\tACGT\r\n"
        b"s\tqry.c\t0\t4\t+\t100\tACGA\r\n\r\n"
    )
    recs = list(MafReader(iolib.BytesIO(maf)).records())
    assert len(recs) == 1
    assert recs[0].target_seq == b"ACGT"
    assert recs[0].query_seq == b"ACGA"

    paf = b"q\t100\t0\t4\t+\tt\t100\t0\t4\t4\t4\t60\tcg:Z:4M\r\n"
    precs = list(PafReader(iolib.BytesIO(paf)).records())
    assert len(precs) == 1
    assert precs[0].get_cigar_string() == "cg:Z:4M"


def test_sline_non_ascii_field_raises_wgaerror():
    """Corrupt bytes in s-line metadata fields must surface as
    ParseMafError (exit-1 CLI message), not a raw UnicodeDecodeError
    traceback (found by scripts/fuzz_campaign.py prop_parser_robustness)."""
    import io

    import pytest

    from wgatools_tpu.errors import WGAError
    from wgatools_tpu.io.maf import MafReader

    maf = (
        b"#maf version=1.6\na score=0\n"
        b"s\tref\xb4chr\t10\t4\t+\t100\tACGT\n"
        b"s\tqry.c\t20\t4\t+\t100\tACGT\n\n"
    )
    with pytest.raises(WGAError):
        for _ in MafReader(io.BytesIO(maf)).records():
            pass


def test_corrupt_cg_tag_raises_wgaerror_not_unicode():
    """A PAF line whose cg tag carries non-ASCII bytes (decoded leniently
    to U+FFFD) must fail record accessors with a WGAError, not a
    UnicodeEncodeError (found by fuzz_campaign prop_parser_robustness)."""
    import io

    import pytest

    from wgatools_tpu.errors import WGAError
    from wgatools_tpu.io.paf import PafReader

    line = (
        b"q\t500\t0\t400\t+\tt\t600\t0\t450\t380\t460\t60\t"
        b"cg:Z:100=5I\xb42\x8e00=10D100=\n"
    )
    recs = list(PafReader(io.BytesIO(line)).records())
    assert len(recs) == 1
    for attr in ("get_stat", "get_cigar_ops"):
        with pytest.raises(WGAError):
            getattr(recs[0], attr)()


def test_chain_data_line_overflow_raises():
    """A 20-digit chain data-line token must raise a clean WGAError in
    BOTH engines (round-5 review finding: the native digit loops lacked
    the overflow guard their sibling tokenizers carry, silently
    wrapping; the numpy fallback overflowed np.int64 with a raw
    OverflowError)."""
    data = (
        b"chain\t255\tt\t100\t+\t0\t50\tq\t100\t+\t0\t50\t1\n"
        b"99999999999999999999\t1\t1\n"
        b"10\n\n"
    )
    with pytest.raises(WGAError):
        list(ChainReader(io.BytesIO(data)).records())
    # native path directly (parse_chain_lines returns an error position)
    from wgatools_tpu import native

    if native.available():
        with pytest.raises(ValueError):
            native.parse_chain_lines(b"99999999999999999999\t1\t1\n10\n")
        with pytest.raises(ValueError):
            native.chain_text_to_cg(b"99999999999999999999\t1\t1\n10\n")


def test_device_stat_rejects_foreign_ops():
    """Ops outside {M,=,X,I,D} must error on the device stat/validate
    path exactly as the host fold does (reference cigar.rs:685; round-5
    review finding: the segment sums silently dropped them)."""
    import numpy as np

    from wgatools_tpu.errors import CigarOpInvalid
    from wgatools_tpu.io.paf import parse_paf_line
    from wgatools_tpu.tools.validate import stream_batch_stats

    line = "q\t20\t0\t10\t+\tt\t20\t0\t10\t10\t10\t60\tcg:Z:5=5S"
    rec = parse_paf_line(line)
    with pytest.raises(CigarOpInvalid):
        rec.get_stat()  # host engine errors...
    with pytest.raises(CigarOpInvalid):
        list(stream_batch_stats([rec]))  # ...and the device batch path
    # pack_ops_words: explicit raise (not a stripped-under--O assert)
    from wgatools_tpu.ops.liftover import pack_ops_words

    with pytest.raises(ValueError):
        pack_ops_words(
            np.full((1, 1), ord("M"), np.uint8),
            np.full((1, 1), 1 << 16, np.int32),
        )
