"""Differential tests for MafRecord.slice_block against a per-char oracle
written straight from the reference description (maf.rs:81-95, 223-248)."""

import io
import random

import pytest

from wgatools_tpu.io.maf import MafReader


def oracle_col_coord(seq: str, pos: int) -> int:
    """get_col_coord: index of the pos-th non-gap char, else len(seq)."""
    region = 0
    for i, c in enumerate(seq):
        if c != "-":
            if region == pos:
                return i
            region += 1
    return len(seq)


def oracle_slice(slines, cut_start, cut_end, ord_):
    """Naive re-implementation of slice_block."""
    out = []
    ref = slines[ord_]
    cut_start_index = cut_start - ref["start"]
    cut_end_index = cut_end - ref["start"]
    sc = oracle_col_coord(ref["seq"], cut_start_index)
    ec = oracle_col_coord(ref["seq"], cut_end_index)
    for i, s in enumerate(slines):
        if i == ord_:
            out.append(
                dict(
                    s,
                    start=cut_start,
                    align=cut_end - cut_start,
                    seq=s["seq"][sc:ec],
                )
            )
        else:
            new_seq = s["seq"][sc:ec]
            pre = ec - sc
            gaps = new_seq.count("-")
            out.append(
                dict(
                    s,
                    start=s["start"] + cut_start_index,
                    align=pre - gaps,
                    seq=new_seq,
                )
            )
    return out


def random_block(rng, n_slines=2):
    cols = rng.randint(20, 200)
    slines = []
    for k in range(n_slines):
        seq = "".join(
            rng.choice("ACGT-" if rng.random() < 0.9 else "-")
            for _ in range(cols)
        )
        # ensure at least a few non-gap chars
        if seq.count("-") > cols - 3:
            seq = "ACG" + seq[3:]
        slines.append(
            {
                "name": f"s{k}",
                "start": rng.randint(0, 1000),
                "align": sum(1 for c in seq if c != "-"),
                "seq": seq,
            }
        )
    return slines


@pytest.mark.parametrize("seed", range(15))
def test_slice_block_matches_oracle(seed):
    rng = random.Random(seed)
    slines = random_block(rng, n_slines=rng.randint(2, 4))
    maf = "#maf\na score=0\n"
    for s in slines:
        maf += (
            f"s\t{s['name']}\t{s['start']}\t{s['align']}\t+\t100000\t{s['seq']}\n"
        )
    maf += "\n"

    for _ in range(10):
        ord_ = rng.randrange(len(slines))
        base = slines[ord_]
        if base["align"] < 2:
            continue
        a = rng.randint(0, base["align"] - 1)
        b = rng.randint(a + 1, base["align"])
        cut_start = base["start"] + a
        cut_end = base["start"] + b

        rec = next(MafReader(io.BytesIO(maf.encode())).records())
        rec.slice_block(cut_start, cut_end, ord_)
        want = oracle_slice(slines, cut_start, cut_end, ord_)
        for got_s, want_s in zip(rec.slines, want):
            assert got_s.start == want_s["start"]
            assert got_s.align_size == want_s["align"]
            assert got_s.seq.decode() == want_s["seq"]
