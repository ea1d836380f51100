"""Host process-pool parity tests."""

import io
import shutil

import pytest

from conftest import fixture_path


@pytest.fixture
def maf_copy(tmp_path):
    p = tmp_path / "t.maf"
    shutil.copy(fixture_path("test.maf"), p)
    return str(p)


def test_offsets_match_reader(maf_copy):
    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.parallel.host_pool import maf_record_offsets

    offsets = maf_record_offsets(maf_copy)
    assert len(offsets) == 1
    reader = MafReader.from_path(maf_copy)
    reader.seek(offsets[0])
    rec = reader.next_record()
    assert rec.target_name == "ref.chr8"


def test_parallel_maf2paf_matches_serial(maf_copy):
    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.parallel.host_pool import parallel_maf2paf
    from wgatools_tpu.tools.convert import maf2paf

    serial = io.BytesIO()
    maf2paf(MafReader.from_path(maf_copy), serial)
    par = io.BytesIO()
    parallel_maf2paf(maf_copy, par, 2)
    assert serial.getvalue() == par.getvalue()


def test_parallel_stat_matches_serial(maf_copy):
    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.parallel.host_pool import parallel_stat_maf
    from wgatools_tpu.tools.stat import stat_maf

    serial = io.BytesIO()
    stat_maf(MafReader.from_path(maf_copy), serial, device=False)
    par = io.BytesIO()
    parallel_stat_maf(maf_copy, par, 2)
    assert serial.getvalue() == par.getvalue()


def test_parallel_call_matches_serial(tmp_path, maf_copy):
    """Multi-record file split across 3 workers."""
    # build a 4-record MAF by repeating the fixture block with shifted starts
    src = open(maf_copy, "rb").read()
    header, _, body = src.partition(b"\n")
    multi = tmp_path / "multi.maf"
    with open(multi, "wb") as fp:
        fp.write(header + b"\n")
        for _ in range(4):
            fp.write(body)

    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.parallel.host_pool import parallel_call_maf
    from wgatools_tpu.tools.caller import call_var_maf

    serial = io.BytesIO()
    call_var_maf(
        MafReader.from_path(str(multi)), None, serial, True, False, 0
    )
    par = io.BytesIO()
    parallel_call_maf(str(multi), par, 3, None, True, False, 0)
    assert serial.getvalue() == par.getvalue()


def test_is_plain_seekable(tmp_path, maf_copy):
    import gzip

    from wgatools_tpu.parallel.host_pool import is_plain_seekable

    assert is_plain_seekable(maf_copy)
    assert not is_plain_seekable(None)
    assert not is_plain_seekable("-")
    gz = tmp_path / "x.maf.gz"
    with gzip.open(gz, "wb") as fp:
        fp.write(b"hi")
    assert not is_plain_seekable(str(gz))


def test_claim_work_units():
    from wgatools_tpu.parallel.distributed import claim_work_units

    idx = {
        "chr1": {
            "isref": True,
            "size": 100,
            "ivls": [
                {"start": 0, "end": 10, "strand": "+", "offset": 5},
                {"start": 10, "end": 20, "strand": "+", "offset": 105},
            ],
        },
        "q1": {"isref": False, "size": 50, "ivls": []},
    }
    a = claim_work_units(idx, 0, 2)
    b = claim_work_units(idx, 1, 2)
    assert len(a) == 1 and len(b) == 1
    assert a[0][3] == 5 and b[0][3] == 105
    # disjoint and complete
    assert {u[3] for u in a} | {u[3] for u in b} == {5, 105}


def test_parallel_paf2chain_matches_serial(tmp_path):
    import random

    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.parallel.host_pool import parallel_paf2chain
    from wgatools_tpu.tools.convert import paf2chain

    rng = random.Random(4)
    rows = ["# a comment"]
    for i in range(23):
        n = rng.randint(2, 12)
        ops = "".join(
            f"{rng.randint(1, 50)}{op}"
            for op in rng.choices("MID", k=n)
        )
        rows.append(
            f"q{i}\t5000\t0\t100\t+\tt{i % 3}\t5000\t0\t100\t50\t100\t255"
            f"\tcg:Z:{ops}"
        )
    paf = tmp_path / "x.paf"
    paf.write_text("\n".join(rows) + "\n")

    serial = io.BytesIO()
    paf2chain(PafReader.from_path(str(paf)), serial)
    for workers in (2, 3, 8):
        par = io.BytesIO()
        parallel_paf2chain(str(paf), par, workers)
        assert serial.getvalue() == par.getvalue(), workers
