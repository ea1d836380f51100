"""Differential tests: vectorized CIGAR engine vs the naive spec oracle."""

import random

import numpy as np
import pytest

from wgatools_tpu.core import cigar as C

import reference_impl as ref


def random_pair(n, seed, gap_rate=0.15, mismatch_rate=0.1):
    rng = random.Random(seed)
    bases = "ACGTacgtN"
    t, q = [], []
    for _ in range(n):
        r = rng.random()
        if r < gap_rate / 2:
            t.append("-")
            q.append(rng.choice(bases))
        elif r < gap_rate:
            t.append(rng.choice(bases))
            q.append("-")
        elif r < gap_rate + 0.01:
            t.append("-")
            q.append("-")
        elif r < gap_rate + 0.01 + mismatch_rate:
            t.append("A")
            q.append("C")
        else:
            b = rng.choice(bases)
            t.append(b)
            q.append(b)
    return "".join(t), "".join(q)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("negative", [False, True])
def test_cigar_from_seqs_matches_oracle(seed, negative):
    t, q = random_pair(500, seed)
    got = C.cigar_from_seqs(C.seq_bytes(t), C.seq_bytes(q), negative)
    want = ref.cigar_counts(t, q, negative)
    assert got.cigar_string == ref.cigar_string(t, q)
    assert got.match_count == want["match"]
    assert got.mismatch_count == want["mismatch"]
    assert got.ins_event == want["ins_event"]
    assert got.ins_count == want["ins"]
    assert got.del_event == want["del_event"]
    assert got.del_count == want["dele"]
    assert got.inv_ins_event == want["inv_ins_event"]
    assert got.inv_ins_count == want["inv_ins"]
    assert got.inv_del_event == want["inv_del_event"]
    assert got.inv_del_count == want["inv_del"]
    assert got.inv_event == want["inv_event"]


@pytest.mark.parametrize("seed", range(8))
def test_classify_modes_match_oracle(seed):
    t, q = random_pair(300, seed)
    ta, qa = C.seq_bytes(t), C.seq_bytes(q)
    for mode, oracle in (
        (C.classify_ext, ref.cat_ext),
        (C.classify_caller, ref.cat_caller),
        (C.classify_m, ref.cat_m),
    ):
        cat = mode(ta, qa)
        chars = "=XIDW" if oracle is not ref.cat_m else "MXIDW"
        got = "".join(chars[c] for c in cat)
        want = "".join(oracle(a, b) for a, b in zip(t, q))
        if oracle is ref.cat_m:
            want = want.replace("X", "M")  # cat_m never yields X
        assert got == want


def test_tokenize_cigar():
    ops, lens = C.tokenize_cigar("25M10I15M20D30M20I30M10D70M")
    assert [chr(o) for o in ops] == list("MIMDMIMDM")
    assert lens.tolist() == [25, 10, 15, 20, 30, 20, 30, 10, 70]
    ops, lens = C.tokenize_cigar("109=1D243=1X12=")
    assert [chr(o) for o in ops] == list("=D=X=")
    assert lens.tolist() == [109, 1, 243, 1, 12]


def test_tokenize_cigar_errors():
    from wgatools_tpu.errors import CigarOpInvalid, ParseIntError

    with pytest.raises((CigarOpInvalid, ParseIntError)):
        C.tokenize_cigar("10MM")
    with pytest.raises((CigarOpInvalid, ParseIntError)):
        C.tokenize_cigar("M")
    with pytest.raises((CigarOpInvalid, ParseIntError)):
        C.tokenize_cigar("10M5")


@pytest.mark.parametrize("seed", range(10))
def test_chain_lines_match_oracle(seed):
    rng = random.Random(1000 + seed)
    op_runs = []
    for _ in range(rng.randint(1, 40)):
        op_runs.append((rng.choice("MIDX="), rng.randint(1, 100)))
    cigar = "".join(f"{n}{op}" for op, n in op_runs)
    ops, lens = C.tokenize_cigar(cigar)
    got_lines, got_final = C.chain_lines_from_ops(ops, lens)
    want_lines, want_final = ref.chain_lines(op_runs)
    assert got_lines == want_lines
    assert got_final == want_final


@pytest.mark.parametrize("seed", range(10))
def test_trims_match_oracle(seed):
    rng = random.Random(2000 + seed)
    op_runs = [(rng.choice("MIDX="), rng.randint(1, 50)) for _ in range(20)]
    cigar = "".join(f"{n}{op}" for op, n in op_runs)
    ops, lens = C.tokenize_cigar(cigar)
    assert C.trims_from_ops(ops, lens) == ref.trims(op_runs)


def test_insert_gaps_by_ops():
    ops, lens = C.tokenize_cigar("3M2I2M1D2M")
    # target consumes 3+2+1+2=8 bases, query consumes 3+2+2+2=9
    t, q = C.insert_gaps_by_ops(ops, lens, b"AAACCGGG", b"TTTNNCCXX")
    # M3 copies both, I2 gaps target, M2 copies, D1 gaps query, M2 copies
    assert t == b"AAA--CCGGG"
    assert q == b"TTTNNCC-XX"


def test_insert_gaps_by_chain():
    lines = [(3, 1, 2)]  # size 3, dq(D)=1, dt(I)=2
    t, q = C.insert_gaps_by_chain(lines, 2, b"AAAGCC", b"TTTNNCC")
    # copy 3; dt=2: target gaps, query real; dq=1: query gap, target real; final 2
    assert t == b"AAA--GCC"
    assert q == b"TTTNN-CC"


def test_pseudo_maf_seq():
    ops, lens = C.tokenize_cigar("3M2I2M1D2X")
    raw_q = b"AAACCGGTT"
    assert C.pseudo_maf_seq_by_ops(ops, lens, raw_q, True) == b"AAAGG-TT"
    assert C.pseudo_maf_seq_by_ops(ops, lens, raw_q, False) == b"11111-00"


def test_reverse_complement():
    assert C.reverse_complement(b"ACGTNacgtn") == b"nacgtNACGT"
    from wgatools_tpu.errors import InvalidBase

    with pytest.raises(InvalidBase):
        C.reverse_complement(b"ACGU")


def test_rle_empty_and_single():
    vals, lens = C.rle(np.array([], dtype=np.uint8))
    assert len(vals) == 0
    vals, lens = C.rle(np.array([3], dtype=np.uint8))
    assert vals.tolist() == [3] and lens.tolist() == [1]


def test_fmt_f32_matches_ryu():
    """Lock f32 formatting to ryu pretty semantics (csv 1.2.2 serializes
    floats through ryu::Buffer::format -- stat.rs:117-122): shortest
    round-trip digits, positional iff -5 < kk <= 13, else d.ddde<exp>
    with unpadded exponent, NaN/inf spellings."""
    from wgatools_tpu.core.fmt import fmt_f32

    cases = [
        (0.99, "0.99"),
        (0.999, "0.999"),
        (1.0, "1.0"),
        (0.0, "0.0"),
        (-0.0, "-0.0"),
        (50.0, "50.0"),
        (1 / 3, "0.33333334"),
        (0.1, "0.1"),
        (123456.78, "123456.78"),
        (1e-5, "0.00001"),
        (1e-9, "1e-9"),        # kk=-8 <= -5: exponential, no zero-pad
        (1e13, "1e13"),        # kk=14 > 13: exponential, no '+'
        (9.9e12, "9900000000000.0"),
        (3.25e-7, "3.25e-7"),
        (float("nan"), "NaN"),
        (float("inf"), "inf"),
        (float("-inf"), "-inf"),
    ]
    for value, want in cases:
        assert fmt_f32(value) == want, (value, fmt_f32(value), want)


def test_fmt_f64_ryu_and_serde_dump():
    """f64 ryu pretty (dotplot CSV cells, dotplot.rs:284-292) and the
    serde_json-compatible dumper (dotplot JSON/HTML specs)."""
    from wgatools_tpu.core.fmt import dumps_serde, fmt_f64_ryu

    cases = [
        (5e-05, "0.00005"),    # Python repr would say 5e-05
        (5e-06, "5e-6"),
        (1e16, "1e16"),
        (1e15, "1000000000000000.0"),
        (1.234e33, "1.234e33"),
        (-2.5e-7, "-2.5e-7"),
        (0.9973, "0.9973"),
        (12340000000.0, "12340000000.0"),
        (1.2345678901234568e16, "1.2345678901234568e16"),
    ]
    for value, want in cases:
        assert fmt_f64_ryu(value) == want, (value, fmt_f64_ryu(value), want)

    obj = {"b": [1, 2.5, 5e-6, True, None], "a": "naïve\n"}
    # sorted keys (serde_json BTreeMap), ryu floats, raw UTF-8
    assert dumps_serde(obj) == '{"a":"naïve\\n","b":[1,2.5,5e-6,true,null]}'
    assert dumps_serde(float("nan")) == "null"  # serde_json write_f64


@pytest.mark.parametrize("seed", range(8))
def test_classify_rle_format_vs_runs(seed):
    """Fused native classify+RLE+format+stats must equal the two-step
    ext_runs/caller_runs + cigar_from_runs path on random gapped pairs."""
    from wgatools_tpu import native
    from wgatools_tpu.core import cigar as C

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(seed)
    n = int(rng.integers(0, 600))
    alpha = np.frombuffer(b"ACGT-", dtype=np.uint8)
    t = alpha[rng.integers(0, 5, size=n)]
    q = np.where(rng.random(n) < 0.7, t, alpha[rng.integers(0, 5, size=n)])
    for caller in (False, True):
        res = native.classify_rle_format(t, q, caller=caller)
        assert res is not None
        body, stats = res
        vals, lens = (C.caller_runs if caller else C.ext_runs)(t, q)
        assert body == C.runs_to_cigar_string(vals, lens)
        for cat in range(5):
            assert stats[2 * cat] == int((vals == cat).sum()), (caller, cat)
            assert stats[2 * cat + 1] == int(lens[vals == cat].sum())
    # and the Cigar object end-to-end for both strands
    for neg in (False, True):
        a = C.cigar_from_seqs(t, q, neg, True, 3, 9)
        vals, lens = C.ext_runs(t, q)
        b = C.cigar_from_runs(vals, lens, neg, True, 3, 9)
        assert a == b


@pytest.mark.parametrize("seed", range(25))
def test_insert_gaps_native_vs_numpy(seed):
    """The C++ memcpy gap-insertion pass must equal the numpy gather
    formulation byte-for-byte, including source-exhaustion clamping and
    empty-source '-' substitution."""
    import random

    import numpy as np

    from wgatools_tpu import native
    from wgatools_tpu.core import cigar as C

    if not native.available():
        pytest.skip("native library unavailable")
    rng = random.Random(seed)
    n = rng.randint(0, 25)
    ops = np.frombuffer(
        "".join(rng.choice("M=XID") for _ in range(n)).encode(),
        dtype=np.uint8,
    )
    lens = np.array(
        [rng.choice([0, 1, 2, 5, 30]) for _ in range(n)], dtype=np.int64
    )
    t_need = int(lens[np.isin(ops, np.frombuffer(b"M=XD", np.uint8))].sum())
    q_need = int(lens[np.isin(ops, np.frombuffer(b"M=XI", np.uint8))].sum())
    bases = "ACGT"
    # the (t_need, 0)/(0, q_need) cases exercise the one-empty-source
    # both-substituted quirk when a cigar has no M/D (or no M/I) ops
    for t_cut, q_cut in (
        (0, 0), (1, 3), (t_need, q_need), (t_need, 0), (0, q_need),
    ):
        t_raw = "".join(rng.choice(bases) for _ in range(max(t_need - t_cut, 0)))
        q_raw = "".join(rng.choice(bases) for _ in range(max(q_need - q_cut, 0)))
        got = native.insert_gaps(ops, lens, t_raw.encode(), q_raw.encode())
        # numpy oracle: bypass the native fast path inside the function
        o = np.asarray(ops)
        l64 = np.asarray(lens, dtype=np.int64)
        is_i = o == C.OP_I
        is_d = o == C.OP_D
        t_gap = np.repeat(is_i, l64)
        q_gap = np.repeat(is_d, l64)
        t_arr = C.seq_bytes(t_raw)
        q_arr = C.seq_bytes(q_raw)
        if t_gap.size == 0:
            want = (b"", b"")
        else:
            if len(t_arr) == 0 or len(q_arr) == 0:
                # either empty -> BOTH substituted (insert_gaps_by_ops)
                t_arr = np.array([C.GAP], dtype=np.uint8)
                q_arr = np.array([C.GAP], dtype=np.uint8)
            t_src = np.cumsum(~t_gap) - 1
            q_src = np.cumsum(~q_gap) - 1
            want = (
                np.where(
                    t_gap, C.GAP, t_arr[np.minimum(t_src, len(t_arr) - 1)]
                ).astype(np.uint8).tobytes(),
                np.where(
                    q_gap, C.GAP, q_arr[np.minimum(q_src, len(q_arr) - 1)]
                ).astype(np.uint8).tobytes(),
            )
        assert got == want, (seed, t_cut, q_cut)


@pytest.mark.parametrize("seed", range(20))
def test_chain_insert_gaps_native_vs_ops(seed):
    """The fused chain-lines gap insertion must equal op_arrays ->
    insert_gaps_by_ops byte-for-byte (incl. zero diffs, zero-size M,
    truncated sources)."""
    import random

    import numpy as np

    from wgatools_tpu import native
    from wgatools_tpu.core import cigar as C

    if not native.available():
        pytest.skip("native library unavailable")
    rng = random.Random(seed)
    n = rng.randint(1, 20)
    sizes = np.array(
        [rng.choice([0, 1, 5, 40]) for _ in range(n)], dtype=np.int64
    )
    dts = np.array(
        [rng.choice([0, 0, 2, 9]) for _ in range(n)], dtype=np.int64
    )
    dqs = np.array(
        [rng.choice([0, 0, 3, 7]) for _ in range(n)], dtype=np.int64
    )
    ops_mat = np.tile(np.array([C.OP_M, C.OP_I, C.OP_D], np.uint8), (n, 1))
    lens_mat = np.stack([sizes, dts, dqs], axis=1)
    keep = lens_mat > 0
    keep[:, 0] = True
    ops = ops_mat.reshape(-1)[keep.reshape(-1)]
    lens = lens_mat.reshape(-1)[keep.reshape(-1)]
    t_need = int(sizes.sum() + dqs.sum())
    q_need = int(sizes.sum() + dts.sum())
    bases = "ACGT"
    t_raw = "".join(rng.choice(bases) for _ in range(t_need)).encode()
    q_raw = "".join(rng.choice(bases) for _ in range(q_need)).encode()
    want = C.insert_gaps_by_ops(ops, lens, t_raw, q_raw)
    got = native.chain_insert_gaps(sizes, dqs, dts, t_raw, q_raw)
    assert got == want, seed
    # truncated sources take the insert-into-copy edge semantics
    # (round-5 review): either a WGAError (an I/D insert would land
    # past the current end, where the reference panics) or a row that
    # simply ends early -- never fabricated bytes
    from wgatools_tpu.errors import WGAError

    if t_need >= 5:
        try:
            tg, qg = C.insert_gaps_by_ops(ops, lens, t_raw[:-5], q_raw)
        except WGAError:
            pass
        else:
            assert len(tg) == len(t_raw) - 5 + int(dts.sum())
            assert qg == want[1]
