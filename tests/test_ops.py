"""Device kernel tests: jnp / Pallas-interpret vs the host numpy engine,
plus shard_map pipelines on the virtual 8-device CPU mesh."""

import random

import numpy as np
import pytest

from wgatools_tpu.core import cigar as C
import jax.numpy as jnp

from wgatools_tpu.ops.classify import (
    classify_stat_jnp,
    classify_stat_pallas,
    classify_stat_pallas_words,
    pack_pairs,
    STAT_MATCHED,
    STAT_RUNS,
)
from wgatools_tpu.ops.segments import cigar_batch_stats, pack_cigar_batch
from wgatools_tpu.ops.coverage import diff_to_coverage, scatter_spans


def _random_pairs(n_pairs, max_len, seed):
    rng = random.Random(seed)
    pairs = []
    for _ in range(n_pairs):
        n = rng.randint(1, max_len)
        t = "".join(rng.choice("ACGTacgt-N") for _ in range(n))
        q = "".join(rng.choice("ACGTacgt-N") for _ in range(n))
        pairs.append((t.encode(), q.encode()))
    return pairs


def _host_expected(pairs):
    rows = []
    for t, q in pairs:
        ta, qa = C.seq_bytes(t), C.seq_bytes(q)
        cat = C.classify_ext(ta, qa)
        vals, lens = C.rle(cat)
        cg = C.cigar_from_runs(vals, lens, False)
        gapgap = int(((ta == C.GAP) & (qa == C.GAP)).sum())
        rows.append(
            [
                cg.match_count,
                cg.mismatch_count,
                cg.ins_count,
                cg.del_count,
                cg.ins_event,
                cg.del_event,
                gapgap,
                len(vals),
            ]
        )
    return np.array(rows, dtype=np.int32)


@pytest.mark.parametrize("seed", range(3))
def test_classify_stat_jnp_vs_host(seed):
    pairs = _random_pairs(7, 900, seed)
    t, q, lens = pack_pairs(pairs)
    got = np.array(classify_stat_jnp(t, q, lens))
    np.testing.assert_array_equal(got, _host_expected(pairs))


@pytest.mark.parametrize("seed", range(3))
def test_classify_stat_pallas_vs_host(seed):
    pairs = _random_pairs(5, 700, seed)
    t, q, lens = pack_pairs(pairs, align=256)
    got = np.array(
        classify_stat_pallas(t, q, lens, tile_b=2, tile_l=256, interpret=True)
    )
    np.testing.assert_array_equal(got, _host_expected(pairs))


def _host_expected_caller(pairs):
    """Caller-mode oracle: classify_caller categories, W runs separate."""
    rows = []
    for t, q in pairs:
        ta, qa = C.seq_bytes(t), C.seq_bytes(q)
        cat = C.classify_caller(ta, qa)
        vals, lens = C.rle(cat)
        rows.append(
            [
                int(lens[vals == 0].sum()),  # EQ (excludes gap/gap)
                int(lens[vals == 1].sum()),  # X
                int(lens[vals == 2].sum()),  # I
                int(lens[vals == 3].sum()),  # D
                int((vals == 2).sum()),
                int((vals == 3).sum()),
                int(lens[vals == 4].sum()),  # W columns
                len(vals),
            ]
        )
    return np.array(rows, dtype=np.int32)


@pytest.mark.parametrize("seed", range(3))
def test_classify_stat_caller_mode_vs_host(seed):
    """Caller-mode (gap/gap -> W) stats: jnp and Pallas-interpret must both
    match the host classify_caller + RLE oracle, including padded rows and
    tile-crossing W runs."""
    pairs = _random_pairs(6, 800, seed)
    # force gap/gap density so W runs actually occur, including trailing
    pairs.append((b"AC--G" + b"-" * 300, b"AC--G" + b"-" * 300))
    t, q, lens = pack_pairs(pairs, align=256)
    want = _host_expected_caller(pairs)
    got_jnp = np.array(classify_stat_jnp(t, q, lens, caller=True))
    np.testing.assert_array_equal(got_jnp, want)
    got_pl = np.array(
        classify_stat_pallas(
            t, q, lens, tile_b=2, tile_l=256, interpret=True, caller=True
        )
    )
    np.testing.assert_array_equal(got_pl, want)


def test_pallas_tile_boundary_runs():
    """A run spanning an L-tile boundary must count as one event."""
    t = b"A" * 100 + b"-" * 120 + b"A" * 100
    q = b"A" * 320
    pairs = [(t, q)]
    tb, qb, lens = pack_pairs(pairs, align=128)
    got = np.array(
        classify_stat_pallas(tb, qb, lens, tile_b=1, tile_l=128, interpret=True)
    )
    np.testing.assert_array_equal(got, _host_expected(pairs))
    assert got[0][4] == 1  # single I event despite crossing tiles


def test_cigar_batch_stats():
    cigars = ["25M10I15M20D30M20I30M10D70M", "10M10D10M10I20M", "5=3X2I1D"]
    op_arrays, len_arrays = [], []
    for cg in cigars:
        ops, lens = C.tokenize_cigar(cg)
        op_arrays.append(ops)
        len_arrays.append(lens)
    ops, lens, row_ids = pack_cigar_batch(op_arrays, len_arrays)
    got = np.array(cigar_batch_stats(ops, lens, row_ids, len(cigars)))
    # matched, mismatched, ins, del, ins_ev, del_ev
    np.testing.assert_array_equal(
        got,
        [
            [170, 0, 30, 30, 2, 2],
            [40, 0, 10, 10, 1, 1],
            [5, 3, 2, 1, 1, 1],
        ],
    )


def test_coverage_scatter():
    import jax.numpy as jnp

    diff = jnp.zeros(11, dtype=jnp.int32)
    starts = jnp.array([0, 5, 5, 8])
    ends = jnp.array([3, 10, 7, 12])
    diff = scatter_spans(diff, starts, ends)
    cov = np.array(diff_to_coverage(diff))
    expect = np.zeros(10, dtype=np.int32)
    for s, e in [(0, 3), (5, 10), (5, 7), (8, 12)]:
        expect[s : min(e, 10)] += 1
    np.testing.assert_array_equal(cov, expect)


class TestMesh:
    def test_eight_devices(self):
        import jax

        assert len(jax.devices()) == 8

    def test_sharded_column_stats(self):
        from wgatools_tpu.parallel.mesh import make_mesh, sharded_column_stats

        pairs = _random_pairs(16, 500, 42)
        t, q, lens = pack_pairs(pairs)
        mesh = make_mesh(8)
        got = np.array(sharded_column_stats(mesh, t, q, lens))
        np.testing.assert_array_equal(got, _host_expected(pairs))

    def test_sharded_pair_reduce(self):
        import jax.numpy as jnp

        from wgatools_tpu.parallel.mesh import make_mesh, sharded_pair_reduce

        mesh = make_mesh(8)
        stats = np.arange(16 * 8, dtype=np.int32).reshape(16, 8)
        pair_ids = np.array([i % 4 for i in range(16)], dtype=np.int32)
        got = np.array(sharded_pair_reduce(mesh, stats, pair_ids, 4))
        expect = np.zeros((4, 8), dtype=np.int64)
        for i in range(16):
            expect[i % 4] += stats[i]
        np.testing.assert_array_equal(got, expect)

    def test_sharded_coverage(self):
        from wgatools_tpu.parallel.mesh import make_mesh, sharded_coverage

        mesh = make_mesh(8)
        # 16 spans sharded 2-per-device; negative start = padding slot
        starts = np.array([0, 1, 2, 3, 4, 5, 6, 7, 0, 2, 4, 6, -1, -1, -1, -1],
                          dtype=np.int32)
        ends = starts + 3
        got = np.array(sharded_coverage(mesh, starts, ends, 12))
        expect = np.zeros(12, dtype=np.int32)
        for s, e in zip(starts.tolist(), ends.tolist()):
            if s < 0:
                continue
            expect[s : min(e, 12)] += 1
        np.testing.assert_array_equal(got, expect)


def test_pallas_partial_tiles():
    """Regression: L or B not divisible by the tile sizes must not let
    out-of-bounds block padding corrupt the counters (found by soak)."""
    # identical pair, padded L=1152 with tile_l=512 -> partial final tile
    t = q = (b"ACGT" * 275)[:1097]
    tb, qb, lens = pack_pairs([(t, q)])
    got = np.array(
        classify_stat_pallas(tb, qb, lens, tile_b=4, tile_l=512, interpret=True)
    )
    np.testing.assert_array_equal(got, _host_expected([(t, q)]))
    # B=3 with tile_b=2 -> partial row tile
    pairs = [(t, q), (b"AC-T", b"ACGT"), (b"AAAA", b"AAAA")]
    tb, qb, lens = pack_pairs(pairs)
    got = np.array(
        classify_stat_pallas(tb, qb, lens, tile_b=2, tile_l=512, interpret=True)
    )
    np.testing.assert_array_equal(got, _host_expected(pairs))


@pytest.mark.parametrize("trial", range(8))
def test_kernel_soak(trial):
    """Randomized shapes/tiles vs the host engine (CI slice of the soak)."""
    rng = random.Random(5000 + trial)
    B = rng.randint(1, 9)
    pairs = []
    for _ in range(B):
        n = rng.randint(1, 2000)
        style = rng.random()
        if style < 0.15:
            t = q = bytes(rng.choice(b"ACGT") for _ in range(n))
        else:
            t = bytes(rng.choice(b"ACGTacgtN--") for _ in range(n))
            q = bytes(rng.choice(b"ACGTacgtN--") for _ in range(n))
        pairs.append((t, q))
    t, q, lens = pack_pairs(pairs)
    expect = _host_expected(pairs)
    np.testing.assert_array_equal(
        np.array(classify_stat_jnp(t, q, lens)), expect
    )
    tile_b = rng.choice([1, 2, 4, 8])
    tile_l = rng.choice([128, 256, 512])
    np.testing.assert_array_equal(
        np.array(
            classify_stat_pallas(
                t, q, lens, tile_b=tile_b, tile_l=tile_l, interpret=True
            )
        ),
        expect,
    )


def _words(a):
    return jnp.asarray(np.ascontiguousarray(a).view("<i4"))


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("caller", [False, True])
def test_classify_stat_words_vs_jnp(seed, caller):
    """Word-packed SWAR kernel == jnp on random ragged batches, both
    category tables, including cross-tile runs and padded rows."""
    pairs = _random_pairs(6, 900, seed)
    pairs.append((b"AC--G" + b"-" * 300, b"AC--G" + b"-" * 300))
    t, q, lens = pack_pairs(pairs, align=256)
    want = np.array(classify_stat_jnp(t, q, lens, caller=caller))
    got = np.array(
        classify_stat_pallas_words(
            _words(t), _words(q), jnp.asarray(lens),
            tile_b=2, tile_lw=64, interpret=True, caller=caller,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_classify_stat_words_tile_boundaries():
    """Runs spanning word AND tile boundaries count once; trailing-padding
    merge logic sees the true last column inside a word."""
    # '=' run crossing a word boundary, D run crossing a tile boundary,
    # record ending mid-word with a non-'=' last column
    t = b"A" * 258 + b"C" * 254 + b"G" * 3
    q = b"A" * 258 + b"-" * 254 + b"T" * 3
    pairs = [(t, q), (b"AAAA", b"AAAA"), (b"ACG", b"AC-")]
    tb, qb, lens = pack_pairs(pairs, align=256)
    want = np.array(classify_stat_jnp(tb, qb, lens))
    got = np.array(
        classify_stat_pallas_words(
            _words(tb), _words(qb), jnp.asarray(lens),
            tile_b=1, tile_lw=64, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(3, 8))
def test_classify_stat_words_fuzz(seed):
    """Wider fuzz for the SWAR kernel: random row counts, ragged lengths,
    gap-dense and SNP-dense mixes, tiny and word-misaligned records."""
    rng = random.Random(seed)
    pairs = []
    for _ in range(rng.randint(2, 9)):
        n = rng.randint(1, 1200)
        profile = rng.choice(["uniform", "gappy", "snpy", "equal"])
        t = []
        q = []
        for _ in range(n):
            if profile == "uniform":
                a, b = rng.choice("ACGT-"), rng.choice("ACGT-")
            elif profile == "gappy":
                a = rng.choice("A---")
                b = rng.choice("C---")
            elif profile == "snpy":
                a, b = rng.choice("AC"), rng.choice("AG")
            else:
                a = rng.choice("ACGT")
                b = a
            t.append(a)
            q.append(b)
        pairs.append(("".join(t).encode(), "".join(q).encode()))
    t, q, lens = pack_pairs(pairs, align=128)
    for caller in (False, True):
        want = np.array(classify_stat_jnp(t, q, lens, caller=caller))
        got = np.array(
            classify_stat_pallas_words(
                _words(t), _words(q), jnp.asarray(lens),
                tile_b=2, tile_lw=32, interpret=True, caller=caller,
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=f"caller={caller}")


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("caller", [False, True])
def test_classify_stat_nibbles_vs_jnp(seed, caller):
    """Nibble-packed (8 cols/word) SWAR kernel == jnp on random ragged
    batches, both category tables (dictionary-coded equality is exact:
    the 15-symbol map is a bijection on its domain)."""
    from wgatools_tpu.ops.classify import (
        classify_stat_pallas_nibbles,
        pack_nibble_words,
    )

    pairs = _random_pairs(6, 900, seed)
    pairs.append((b"AC--G" + b"-" * 300, b"AC--G" + b"-" * 300))
    t, q, lens = pack_pairs(pairs, align=256)
    want = np.array(classify_stat_jnp(t, q, lens, caller=caller))
    tw, qw = pack_nibble_words(t, q)
    got = np.array(
        classify_stat_pallas_nibbles(
            jnp.asarray(tw), jnp.asarray(qw), jnp.asarray(lens),
            tile_b=2, tile_lw=32, interpret=True, caller=caller,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_classify_stat_nibbles_tile_boundaries():
    """Runs spanning nibble-word AND tile boundaries count once; the
    trailing-padding merge sees the true last column inside a word
    (8 columns per word: all 8 in-word end positions exercised)."""
    from wgatools_tpu.ops.classify import (
        classify_stat_pallas_nibbles,
        pack_nibble_words,
    )

    pairs = [
        (b"A" * 258 + b"C" * 254 + b"G" * 3, b"A" * 258 + b"-" * 254 + b"T" * 3),
        (b"AAAA", b"AAAA"),
        (b"ACG", b"AC-"),
    ]
    # every end-position mod 8
    for k in range(1, 9):
        pairs.append((b"ACGTACGTA"[:k], b"ACGTACGTA"[:k]))
        pairs.append((b"ACGTACGTA"[:k], b"ACG-ACG-A"[:k]))
    tb, qb, lens = pack_pairs(pairs, align=256)
    want = np.array(classify_stat_jnp(tb, qb, lens))
    tw, qw = pack_nibble_words(tb, qb)
    got = np.array(
        classify_stat_pallas_nibbles(
            jnp.asarray(tw), jnp.asarray(qw), jnp.asarray(lens),
            tile_b=1, tile_lw=32, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(3, 8))
def test_classify_stat_nibbles_fuzz(seed):
    """Profile-mixed fuzz for the nibble kernel (mirrors the words-kernel
    fuzz), plus dictionary-fallback coverage for out-of-alphabet bytes."""
    from wgatools_tpu.ops.classify import (
        classify_stat_pallas_nibbles,
        pack_nibble_words,
    )

    rng = random.Random(seed)
    pairs = []
    for _ in range(rng.randint(2, 9)):
        n = rng.randint(1, 1200)
        profile = rng.choice(["uniform", "gappy", "snpy", "equal"])
        t = []
        q = []
        for _ in range(n):
            if profile == "uniform":
                a, b = rng.choice("ACGT-"), rng.choice("ACGT-")
            elif profile == "gappy":
                a = rng.choice("A---")
                b = rng.choice("C---")
            elif profile == "snpy":
                a, b = rng.choice("AC"), rng.choice("AG")
            else:
                a = rng.choice("ACGTNacgtn.")
                b = a
            t.append(a)
            q.append(b)
        pairs.append(("".join(t).encode(), "".join(q).encode()))
    t, q, lens = pack_pairs(pairs, align=128)
    packed = pack_nibble_words(t, q)
    assert packed is not None
    tw, qw = packed
    for caller in (False, True):
        want = np.array(classify_stat_jnp(t, q, lens, caller=caller))
        got = np.array(
            classify_stat_pallas_nibbles(
                jnp.asarray(tw), jnp.asarray(qw), jnp.asarray(lens),
                tile_b=2, tile_lw=32, interpret=True, caller=caller,
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=f"caller={caller}")


def test_pack_nibble_words_fallback():
    """Out-of-dictionary bytes (IUPAC R etc.) must return None, never a
    lossy packing; misaligned widths also fall back."""
    from wgatools_tpu.ops.classify import pack_nibble_words

    t, q, _ = pack_pairs([(b"ACGTR", b"ACGTA")])
    assert pack_nibble_words(t, q) is None
    t, q, _ = pack_pairs([(b"ACGT", b"ACGY")])
    assert pack_nibble_words(t, q) is None
    # aligned, in-dictionary -> packs; nibble 0 is the gap
    t, q, _ = pack_pairs([(b"-ACGTNacgtn.", b"-ACGTNacgtn.")])
    packed = pack_nibble_words(t, q)
    assert packed is not None
    tw, qw = packed
    assert tw.dtype == np.int32 and tw.shape[1] == t.shape[1] // 8
    assert (tw[0, 0] & 0xF) == 0  # '-' -> code 0


def test_pack_nibble_words_native_vs_numpy():
    """The C++ one-pass packer and the numpy fallback must produce
    identical words on every dictionary byte, and agree on rejecting
    out-of-dictionary bytes (round-4 review: the fallback branch had no
    differential coverage while the native lib is present in CI)."""
    import numpy as np

    from wgatools_tpu import native
    from wgatools_tpu.ops.classify import _NIB_ALPHABET, pack_nibble_words

    if native.load() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(8)
    alpha = np.frombuffer(_NIB_ALPHABET, np.uint8)
    t = alpha[rng.integers(0, len(alpha), (5, 256))]
    q = alpha[rng.integers(0, len(alpha), (5, 256))]
    nat = pack_nibble_words(t, q, use_native=True)
    fal = pack_nibble_words(t, q, use_native=False)
    assert nat is not None and fal is not None
    assert np.array_equal(nat[0], fal[0])
    assert np.array_equal(nat[1], fal[1])
    # out-of-dictionary byte: both paths must reject
    t_bad = t.copy()
    t_bad[2, 100] = ord("R")  # IUPAC purine, not in the dictionary
    assert pack_nibble_words(t_bad, q, use_native=True) is None
    assert pack_nibble_words(t_bad, q, use_native=False) is None


# ---------------------------------------------------------------------------
# Category-plane kernel (round 5): the host LUT classifies each column
# pair into a one-hot nibble, halving the device input vs the two
# nibble planes and dropping the dictionary restriction entirely.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("caller", [False, True])
def test_classify_stat_cat_vs_jnp(seed, caller):
    """Category-plane kernel == jnp on random ragged batches, both
    category tables, from the SAME packed plane."""
    from wgatools_tpu.ops.classify import (
        classify_stat_pallas_cat,
        pack_cat_nibbles,
    )

    pairs = _random_pairs(6, 900, seed)
    pairs.append((b"AC--G" + b"-" * 300, b"AC--G" + b"-" * 300))
    t, q, lens = pack_pairs(pairs, align=256)
    want = np.array(classify_stat_jnp(t, q, lens, caller=caller))
    cw = pack_cat_nibbles(t, q)
    got = np.array(
        classify_stat_pallas_cat(
            jnp.asarray(cw), jnp.asarray(lens),
            tile_b=2, tile_lw=32, interpret=True, caller=caller,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_classify_stat_cat_tile_boundaries():
    """Runs spanning word AND tile boundaries count once; gap/gap runs
    adjacent to '=' runs must MERGE in ext mode (the bit-3-masked diff)
    but stay separate W runs in caller mode; all 8 in-word end
    positions."""
    from wgatools_tpu.ops.classify import (
        classify_stat_pallas_cat,
        pack_cat_nibbles,
    )

    pairs = [
        (b"A" * 258 + b"C" * 254 + b"G" * 3, b"A" * 258 + b"-" * 254 + b"T" * 3),
        # '=' / gap-gap / '=' alternation straddling word boundaries:
        # one run in ext mode, three in caller mode
        (b"A" * 7 + b"-" * 9 + b"C" * 8, b"A" * 7 + b"-" * 9 + b"C" * 8),
        (b"AAAA", b"AAAA"),
        (b"ACG", b"AC-"),
    ]
    for k in range(1, 9):
        pairs.append((b"ACGTACGTA"[:k], b"ACGTACGTA"[:k]))
        pairs.append((b"ACGTACGTA"[:k], b"ACG-ACG-A"[:k]))
    tb, qb, lens = pack_pairs(pairs, align=256)
    cw = pack_cat_nibbles(tb, qb)
    for caller in (False, True):
        want = np.array(classify_stat_jnp(tb, qb, lens, caller=caller))
        got = np.array(
            classify_stat_pallas_cat(
                jnp.asarray(cw), jnp.asarray(lens),
                tile_b=1, tile_lw=32, interpret=True, caller=caller,
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=f"caller={caller}")


@pytest.mark.parametrize("seed", range(3, 8))
def test_classify_stat_cat_fuzz(seed):
    """Profile-mixed fuzz for the cat kernel, INCLUDING out-of-dictionary
    bytes (IUPAC codes) that the nibble kernel cannot take -- the 64K
    LUT is total over byte pairs."""
    from wgatools_tpu.ops.classify import (
        classify_stat_pallas_cat,
        pack_cat_nibbles,
    )

    rng = random.Random(seed)
    pairs = []
    for _ in range(rng.randint(2, 9)):
        n = rng.randint(1, 1200)
        profile = rng.choice(["uniform", "gappy", "snpy", "iupac"])
        t = []
        q = []
        for _ in range(n):
            if profile == "uniform":
                a, b = rng.choice("ACGT-"), rng.choice("ACGT-")
            elif profile == "gappy":
                a = rng.choice("A---")
                b = rng.choice("C---")
            elif profile == "snpy":
                a, b = rng.choice("AC"), rng.choice("AG")
            else:
                a = rng.choice("ACGTRYKMswn-*")
                b = rng.choice("ACGTRYKMswn-*")
            t.append(a)
            q.append(b)
        pairs.append(("".join(t).encode(), "".join(q).encode()))
    t, q, lens = pack_pairs(pairs, align=128)
    cw = pack_cat_nibbles(t, q)
    assert cw is not None
    for caller in (False, True):
        want = np.array(classify_stat_jnp(t, q, lens, caller=caller))
        got = np.array(
            classify_stat_pallas_cat(
                jnp.asarray(cw), jnp.asarray(lens),
                tile_b=2, tile_lw=32, interpret=True, caller=caller,
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=f"caller={caller}")


def test_pack_cat_nibbles_native_vs_numpy():
    """The C++ 64K-LUT packer and the numpy fallback must produce
    identical cat words on arbitrary byte pairs (no dictionary
    restriction to reject)."""
    from wgatools_tpu import native
    from wgatools_tpu.ops.classify import pack_cat_nibbles

    if native.load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    t = rng.integers(0, 256, (5, 256)).astype(np.uint8)
    q = rng.integers(0, 256, (5, 256)).astype(np.uint8)
    nat = pack_cat_nibbles(t, q, use_native=True)
    fal = pack_cat_nibbles(t, q, use_native=False)
    assert nat is not None and fal is not None
    assert np.array_equal(nat, fal)
    # misaligned width falls back to None (callers route elsewhere)
    assert pack_cat_nibbles(t[:, :251], q[:, :251]) is None


@pytest.mark.parametrize("caller", [False, True])
def test_fused_adv16_catmode_vs_nibble(caller):
    """classify_liftover_fused_adv16(catmode=True) == the nibble form on
    the same batch: stats and group anchors bit-identical."""
    from wgatools_tpu.ops.classify import pack_cat_nibbles, pack_nibble_words
    from wgatools_tpu.ops.fused import classify_liftover_fused_adv16
    from wgatools_tpu.ops.liftover import pack_ops_sums

    rng = np.random.default_rng(5)
    pairs = _random_pairs(5, 700, 17)
    t, q, lens = pack_pairs(pairs, align=256)
    op_chars = np.frombuffer(b"M=XIDS", np.uint8)
    ops = op_chars[rng.integers(0, 6, (4, 64))]
    lens_op = rng.integers(0, 8000, (4, 64)).astype(np.int32)
    wt, wq = pack_ops_sums(ops, lens_op, group=8)

    tn, qn = pack_nibble_words(t, q)
    want = classify_liftover_fused_adv16(
        jnp.asarray(tn), jnp.asarray(qn), jnp.asarray(lens),
        jnp.asarray(wt), jnp.asarray(wq),
        tile_b=2, tile_lw=32, interpret=True, caller=caller,
        nibble=True, scan_mode="mm", raw_sums=True,
    )
    cw = pack_cat_nibbles(t, q)
    got = classify_liftover_fused_adv16(
        jnp.asarray(cw), None, jnp.asarray(lens),
        jnp.asarray(wt), jnp.asarray(wq),
        tile_b=2, tile_lw=32, interpret=True, caller=caller,
        catmode=True, scan_mode="mm", raw_sums=True,
    )
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_classify_wrappers_pad_sub128_lane_batches():
    """Lane-dim blocks must stay >= 128 (Mosaic (8,128) alignment): a
    small trailing flush batch (LW < 128 words) pads UP instead of
    shrinking the tile.  All four wrappers, interpret mode + shape
    check; the on-chip parity for this shape ran 2026-08-20."""
    from wgatools_tpu.ops.classify import (
        classify_stat_pallas,
        classify_stat_pallas_cat,
        classify_stat_pallas_nibbles,
        classify_stat_pallas_words,
        pack_cat_nibbles,
        pack_nibble_words,
    )

    pairs = [(b"ACGT-ACG", b"ACGTTACG"), (b"AC", b"A-")]
    t, q, lens = pack_pairs(pairs)  # L = 128 -> LW = 16 (nibble) / 32 (word)
    want = np.array(classify_stat_jnp(t, q, lens))
    got_b = np.array(
        classify_stat_pallas(
            jnp.asarray(t), jnp.asarray(q), jnp.asarray(lens),
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got_b, want)
    tw, qw = t.view("<i4"), q.view("<i4")
    got_w = np.array(
        classify_stat_pallas_words(
            jnp.asarray(tw), jnp.asarray(qw), jnp.asarray(lens),
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got_w, want)
    tn, qn = pack_nibble_words(t, q)
    got_n = np.array(
        classify_stat_pallas_nibbles(
            jnp.asarray(tn), jnp.asarray(qn), jnp.asarray(lens),
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got_n, want)
    cw = pack_cat_nibbles(t, q)
    got_c = np.array(
        classify_stat_pallas_cat(
            jnp.asarray(cw), jnp.asarray(lens), interpret=True
        )
    )
    np.testing.assert_array_equal(got_c, want)
