"""Device-path parity for the liftover-family converters (round-2
VERDICT next-step #7): paf2chain and chain2paf with device=True must be
byte-identical to the host/C++ paths.

On the CPU test backend the device pipeline exercises the same batching,
chain_scan dispatch, and boundary-gather code as on TPU (the Pallas
kernel itself is parity-gated on-chip by bench.py and ab_fused.py).
"""

import io
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from synth import make_paf_case, random_ops  # noqa: E402

from wgatools_tpu.io.chain import ChainReader
from wgatools_tpu.io.paf import PafReader
from wgatools_tpu.tools import convert


def _paf_bytes(n=23):
    rows = []
    rng = random.Random(7)
    for i in range(n):
        paf, _, _ = make_paf_case(1000 + i, negative=(i % 3 == 0))
        rows.append(paf)
    # one record with a big M run and interleaved indels
    ops = random_ops(rng, 40)
    cg = "".join(f"{ln}{op}" for op, ln in ops)
    m = sum(ln for op, ln in ops if op in "=X")
    qspan = sum(ln for op, ln in ops if op in "=XI")
    tspan = sum(ln for op, ln in ops if op in "=XD")
    rows.append(
        f"qq\t{qspan + 5}\t2\t{qspan + 2}\t+\ttt\t{tspan + 9}\t3\t"
        f"{tspan + 3}\t{m}\t{m}\t255\tcg:Z:{cg}"
    )
    return ("\n".join(rows) + "\n").encode()


def test_paf2chain_device_parity():
    data = _paf_bytes()
    host = io.BytesIO()
    convert.paf2chain(PafReader(io.BytesIO(data)), host, device=False)
    dev = io.BytesIO()
    convert._paf2chain_device(PafReader(io.BytesIO(data)), dev, min_ops=0)
    assert dev.getvalue() == host.getvalue()
    # default gate: tiny inputs fall back to the host path inside
    # device=True and still match
    dev2 = io.BytesIO()
    convert.paf2chain(PafReader(io.BytesIO(data)), dev2, device=True)
    assert dev2.getvalue() == host.getvalue()


def test_paf2chain_device_parity_tiny_batches():
    """Multiple flushes: batch_ops smaller than the record op counts."""
    data = _paf_bytes()
    host = io.BytesIO()
    convert.paf2chain(PafReader(io.BytesIO(data)), host, device=False)
    dev = io.BytesIO()
    convert._paf2chain_device(
        PafReader(io.BytesIO(data)), dev, batch_ops=8, min_ops=0
    )
    assert dev.getvalue() == host.getvalue()


def test_paf2chain_device_outlier_fallback():
    """An op length >= 2^16 routes that record through the host path
    mid-stream; chain ids and bytes stay identical."""
    paf0, _, _ = make_paf_case(5)
    big = (
        "qb\t200000\t0\t131074\t+\ttb\t200000\t0\t131073\t"
        "131072\t131074\t255\tcg:Z:65536=1X2I65536="
    )
    paf1, _, _ = make_paf_case(6, negative=True)
    data = ("\n".join([paf0, big, paf1]) + "\n").encode()
    host = io.BytesIO()
    convert.paf2chain(PafReader(io.BytesIO(data)), host, device=False)
    dev = io.BytesIO()
    convert._paf2chain_device(PafReader(io.BytesIO(data)), dev, min_ops=0)
    assert dev.getvalue() == host.getvalue()
    assert b"chain" in dev.getvalue()


def _chain_bytes():
    data = _paf_bytes()
    buf = io.BytesIO()
    convert.paf2chain(PafReader(io.BytesIO(data)), buf, device=False)
    return buf.getvalue()


def test_chain2paf_device_parity():
    data = _chain_bytes()
    host = io.BytesIO()
    convert.chain2paf(ChainReader(io.BytesIO(data)), host, device=False)
    dev = io.BytesIO()
    convert._chain2paf_device(ChainReader(io.BytesIO(data)), dev, min_lines=0)
    assert dev.getvalue() == host.getvalue()
    dev2 = io.BytesIO()
    convert.chain2paf(ChainReader(io.BytesIO(data)), dev2, device=True)
    assert dev2.getvalue() == host.getvalue()


def test_chain2paf_device_parity_tiny_batches():
    data = _chain_bytes()
    host = io.BytesIO()
    convert.chain2paf(ChainReader(io.BytesIO(data)), host, device=False)
    dev = io.BytesIO()
    convert._chain2paf_device(
        ChainReader(io.BytesIO(data)), dev, batch_lines=4, min_lines=0
    )
    assert dev.getvalue() == host.getvalue()


def test_chain_scan_matches_host_cumsums():
    """chain_scan == exclusive numpy cumsums of I-lens / D-lens."""
    from wgatools_tpu.ops.liftover import chain_scan, pack_ops_batch

    rng = np.random.default_rng(3)
    op_chars = np.frombuffer(b"M=XID", dtype=np.uint8)
    op_arrays, len_arrays = [], []
    for _ in range(9):
        n = int(rng.integers(1, 700))
        op_arrays.append(op_chars[rng.integers(0, 5, n)])
        len_arrays.append(rng.integers(0, 5000, n).astype(np.int32))
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    ei, ed = (np.asarray(a) for a in chain_scan(ops, lens))
    for k, (o, l) in enumerate(zip(op_arrays, len_arrays)):
        ins = np.where(o == ord("I"), l, 0).astype(np.int64)
        dele = np.where(o == ord("D"), l, 0).astype(np.int64)
        np.testing.assert_array_equal(
            ei[k, : len(o)], np.cumsum(ins) - ins
        )
        np.testing.assert_array_equal(
            ed[k, : len(o)], np.cumsum(dele) - dele
        )


def test_round_trip_device_paths():
    """paf2chain(device) | chain2paf(device) reproduces the host-path
    round trip byte-for-byte."""
    data = _paf_bytes(9)
    h1 = io.BytesIO()
    convert.paf2chain(PafReader(io.BytesIO(data)), h1, device=False)
    h2 = io.BytesIO()
    convert.chain2paf(ChainReader(io.BytesIO(h1.getvalue())), h2, device=False)
    d1 = io.BytesIO()
    convert._paf2chain_device(PafReader(io.BytesIO(data)), d1, min_ops=0)
    d2 = io.BytesIO()
    convert._chain2paf_device(
        ChainReader(io.BytesIO(d1.getvalue())), d2, min_lines=0
    )
    assert d1.getvalue() == h1.getvalue()
    assert d2.getvalue() == h2.getvalue()
