"""BGZF FASTA random access tests."""

import gzip
import random

import pytest

from wgatools_tpu.io.bgzf import (
    BgzfReader,
    bgzf_compress,
    is_bgzf,
    scan_index,
    write_gzi,
)
from wgatools_tpu.io.fasta import FastaReader


def make_fasta(rng, n_seqs=3, max_len=200_000):
    parts = []
    seqs = {}
    for k in range(n_seqs):
        n = rng.randint(1000, max_len)
        seq = "".join(rng.choice("ACGT") for _ in range(n))
        seqs[f"chr{k}"] = seq
        parts.append(f">chr{k} description {k}\n")
        for lo in range(0, n, 60):
            parts.append(seq[lo : lo + 60] + "\n")
    return "".join(parts).encode(), seqs


@pytest.fixture
def fasta_pair(tmp_path):
    rng = random.Random(0)
    data, seqs = make_fasta(rng)
    plain = tmp_path / "g.fa"
    plain.write_bytes(data)
    bg = tmp_path / "g.fa.gz"
    bg.write_bytes(bgzf_compress(data))
    return str(plain), str(bg), seqs


def test_is_bgzf(fasta_pair, tmp_path):
    plain, bg, _ = fasta_pair
    assert is_bgzf(bg)
    assert not is_bgzf(plain)
    # plain gzip is not bgzf
    pg = tmp_path / "p.fa.gz"
    with gzip.open(pg, "wb") as fp:
        fp.write(b">x\nACGT\n")
    assert not is_bgzf(str(pg))


def test_bgzf_read_slice_matches_plain(fasta_pair):
    plain, bg, _ = fasta_pair
    data = open(plain, "rb").read()
    reader = BgzfReader(bg)
    rng = random.Random(1)
    for _ in range(50):
        a = rng.randint(0, len(data) - 1)
        ln = rng.randint(1, 100_000)
        assert reader.read_slice(a, ln) == data[a : a + ln]


def test_bgzf_gzi_roundtrip(fasta_pair, tmp_path):
    _, bg, _ = fasta_pair
    blocks, total = scan_index(bg)
    write_gzi(bg + ".gzi", blocks)
    reader = BgzfReader(bg)  # now loads the .gzi
    data_start = reader.read_slice(0, 20)
    assert data_start.startswith(b">chr0")


def test_fasta_reader_bgzf_fetch(fasta_pair):
    plain, bg, seqs = fasta_pair
    fr_plain = FastaReader(plain)
    fr_bg = FastaReader(bg)
    rng = random.Random(2)
    for name, seq in seqs.items():
        for _ in range(20):
            a = rng.randint(0, len(seq) - 2)
            b = rng.randint(a, len(seq) - 1)
            want = seq[a : b + 1].encode()
            assert fr_plain.fetch(name, a, b) == want
            assert fr_bg.fetch(name, a, b) == want
    # clamped end
    name, seq = next(iter(seqs.items()))
    assert fr_bg.fetch(name, 0, 10**9) == seq.encode()


def test_paf2maf_with_bgzf_fasta(tmp_path):
    """End-to-end: paf2maf with bgzip-compressed target/query FASTA."""
    import io
    import sys

    sys.path.insert(0, "tests")
    from synth import make_paf_case

    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.tools.convert import maf2paf, paf2maf

    paf_line, t_fa, q_fa = make_paf_case(77, negative=False)
    t_path = tmp_path / "t.fa.gz"
    q_path = tmp_path / "q.fa.gz"
    t_path.write_bytes(bgzf_compress(t_fa.encode()))
    q_path.write_bytes(bgzf_compress(q_fa.encode()))
    maf = io.BytesIO()
    paf2maf(
        PafReader(io.BytesIO(paf_line.encode())),
        maf,
        str(t_path),
        str(q_path),
    )
    out = io.BytesIO()
    maf2paf(MafReader(io.BytesIO(maf.getvalue())), out)
    assert out.getvalue().decode().strip() == paf_line
