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
