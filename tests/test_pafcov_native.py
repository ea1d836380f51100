"""Differential test: the fused C++ coverage scatter (cigar_cov_diff) must
equal the numpy span-table path bit-for-bit, including out-of-range span
clipping and non-advancing I/S ops."""

import random

import numpy as np
import pytest

from wgatools_tpu import native
from wgatools_tpu.io.paf import parse_paf_line
from wgatools_tpu.tools.pafcov import accumulate_record

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _rec(seed):
    rng = random.Random(seed)
    n = rng.randint(1, 30)
    cg = "".join(
        f"{rng.choice([1, 2, 5, 100])}{rng.choice('M=XIDS')}"
        for _ in range(n)
    )
    tl = rng.choice([50, 500, 5000])  # small: forces clipping
    ts = rng.randint(0, 40)
    return parse_paf_line(
        f"q\t9999\t0\t100\t+\tt{seed % 3}\t{tl}\t{ts}\t{min(tl, ts + 60)}"
        f"\t1\t100\t60\tcg:Z:{cg}"
    )


@pytest.mark.parametrize("seed", range(30))
def test_cov_diff_native_vs_numpy(seed):
    recs = [_rec(seed * 100 + k) for k in range(8)]
    native_map, numpy_map = {}, {}
    for rec in recs:
        accumulate_record(rec, native_map, use_native=True)
        accumulate_record(rec, numpy_map, use_native=False)
    assert native_map.keys() == numpy_map.keys()
    for t in native_map:
        np.testing.assert_array_equal(native_map[t], numpy_map[t])
