"""-t parity for the round-2 pool-covered tools: chain2paf, stat -f paf,
pafcov, validate, filter -a, dotplot, pafpseudo.

Every parallel path must produce byte-identical output to the serial path
(the reference's rayon map-reduces are order-preserving / associative:
converter.rs:404, stat.rs:94, pafcov.rs:31, validate.rs:52, filter.rs:116,
dotplot.rs:236-366, pseudomaf.rs:63).
"""

import io
import random

import pytest


def _synth_paf(tmp_path, n=23, seed=7, corrupt_ends=False, n_targets=3):
    """Coordinate-consistent PAF with random CIGARs over a few targets."""
    rng = random.Random(seed)
    rows = ["# synthetic"]
    for i in range(n):
        n_runs = rng.randint(2, 12)
        ops = []
        last = None
        for _ in range(n_runs):
            op = rng.choice([o for o in "MIDX" if o != last])
            last = op
            ops.append((op, rng.randint(1, 40)))
        if ops[0][0] in "ID":
            ops.insert(0, ("M", 5))
        if ops[-1][0] in "ID":
            ops.append(("M", 5))
        q_span = sum(n for o, n in ops if o in "MXI")
        t_span = sum(n for o, n in ops if o in "MXD")
        strand = "+" if rng.random() < 0.7 else "-"
        q_start = rng.randint(0, 100)
        t_start = rng.randint(0, 100)
        q_end = q_start + q_span
        t_end = t_start + t_span
        if corrupt_ends and rng.random() < 0.4:
            q_end += rng.randint(1, 5)
        if corrupt_ends and rng.random() < 0.4:
            t_end += rng.randint(1, 5)
        cg = "".join(f"{n}{o}" for o, n in ops)
        matched = sum(n for o, n in ops if o == "M")
        rows.append(
            f"q{i % 5}\t2000\t{q_start}\t{q_end}\t{strand}\t"
            f"t{i % n_targets}\t2000\t{t_start}\t{t_end}\t{matched}\t"
            f"{max(q_span, t_span)}\t255\tcg:Z:{cg}"
        )
    p = tmp_path / "x.paf"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def _multi_maf(tmp_path):
    from conftest import fixture_path

    src = open(fixture_path("test.maf"), "rb").read()
    header, _, body = src.partition(b"\n")
    p = tmp_path / "multi.maf"
    with open(p, "wb") as fp:
        fp.write(header + b"\n")
        for _ in range(5):
            fp.write(body)
    return str(p)


@pytest.mark.parametrize("workers", [2, 3, 8])
def test_parallel_chain2paf(tmp_path, workers):
    from wgatools_tpu.io.chain import ChainReader
    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.parallel.host_pool import parallel_chain2paf
    from wgatools_tpu.tools.convert import chain2paf, paf2chain

    paf = _synth_paf(tmp_path)
    chain_buf = io.BytesIO()
    paf2chain(PafReader.from_path(paf), chain_buf)
    chain_path = tmp_path / "x.chain"
    chain_path.write_bytes(chain_buf.getvalue())

    serial = io.BytesIO()
    chain2paf(ChainReader.from_path(str(chain_path)), serial)
    par = io.BytesIO()
    parallel_chain2paf(str(chain_path), par, workers)
    assert serial.getvalue() == par.getvalue()
    assert serial.getvalue()  # non-empty


@pytest.mark.parametrize("each", [False, True])
def test_parallel_stat_paf(tmp_path, each):
    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.parallel.host_pool import parallel_stat_paf
    from wgatools_tpu.tools.stat import stat_paf

    paf = _synth_paf(tmp_path)
    serial = io.BytesIO()
    stat_paf(PafReader.from_path(paf), serial, each, device=False)
    par = io.BytesIO()
    parallel_stat_paf(paf, par, 3, each)
    assert serial.getvalue() == par.getvalue()


def test_parallel_pafcov(tmp_path):
    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.parallel.host_pool import parallel_pafcov
    from wgatools_tpu.tools.pafcov import pafcov

    paf = _synth_paf(tmp_path)
    serial = io.BytesIO()
    pafcov(PafReader.from_path(paf), serial)
    par = io.BytesIO()
    parallel_pafcov(paf, par, 3)
    assert serial.getvalue() == par.getvalue()
    assert serial.getvalue()


def test_parallel_validate(tmp_path):
    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.parallel.host_pool import parallel_validate_paf
    from wgatools_tpu.tools.validate import validate_paf

    paf = _synth_paf(tmp_path, corrupt_ends=True, seed=11)
    serial = io.BytesIO()
    serial_fix = io.BytesIO()
    validate_paf(
        PafReader.from_path(paf), serial, serial_fix, True, device=False
    )
    par = io.BytesIO()
    par_fix = io.BytesIO()
    parallel_validate_paf(paf, par, 3, par_fix, True)
    assert serial.getvalue() == par.getvalue()
    assert serial_fix.getvalue() == par_fix.getvalue()
    assert b"invalid" in serial.getvalue()


def test_parallel_filter_align_pair(tmp_path):
    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.parallel.host_pool import (
        parallel_filter_paf_align_pair,
    )
    from wgatools_tpu.tools.filter import filter_paf_align_pair

    paf = _synth_paf(tmp_path, n=31, seed=5)
    # pick a threshold that keeps some pairs and drops others
    serial = io.BytesIO()
    filter_paf_align_pair(PafReader.from_path(paf), serial, 400)
    par = io.BytesIO()
    parallel_filter_paf_align_pair(paf, par, 3, 400)
    assert serial.getvalue() == par.getvalue()
    assert serial.getvalue()


@pytest.mark.parametrize("mode", ["overview", "base-level"])
@pytest.mark.parametrize("fmt", ["maf", "paf"])
def test_parallel_dotplot(tmp_path, mode, fmt):
    from wgatools_tpu.tools.dotplot import dotplot

    path = _synth_paf(tmp_path) if fmt == "paf" else _multi_maf(tmp_path)
    serial = io.BytesIO()
    dotplot(path, serial, fmt, "csv", mode, False, 50, None, None, threads=1)
    par = io.BytesIO()
    dotplot(path, par, fmt, "csv", mode, False, 50, None, None, threads=3)
    assert serial.getvalue() == par.getvalue()
    assert serial.getvalue().count(b"\n") > 1


def test_parallel_pseudomaf(tmp_path):
    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.tools.pseudomaf import generate_pseudo_maf

    paf = _synth_paf(tmp_path, n=17, seed=9, n_targets=4)
    d1 = tmp_path / "serial"
    d2 = tmp_path / "par"
    generate_pseudo_maf(PafReader.from_path(paf), str(d1), None, None)
    generate_pseudo_maf(
        PafReader.from_path(paf), str(d2), None, None, threads=3
    )
    f1 = sorted(p.name for p in d1.iterdir())
    f2 = sorted(p.name for p in d2.iterdir())
    assert f1 == f2 and len(f1) == 4
    for name in f1:
        assert (d1 / name).read_bytes() == (d2 / name).read_bytes()
