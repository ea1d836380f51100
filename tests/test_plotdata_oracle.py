"""Differential tests for dotplot base-level segment emission against a
naive oracle following emit_baseplotdatas (reference: cigar.rs:815-952)."""

import random

import pytest

from wgatools_tpu.io.paf import PafRecord
from wgatools_tpu.tools.dotplot import base_plotdata_from_runs


def oracle_emit(op_runs, rec, cutoff):
    negative = rec.strand == "-"
    ref_off, q_off = rec.target_start, rec.query_start
    out = []
    last_m = False

    def push(rs, re_, qs, qe, cig):
        if negative:
            qs, qe = qe, qs
        out.append(
            {
                "ref_start": rs,
                "ref_end": re_,
                "query_start": qs,
                "query_end": qe,
                "cigar": cig,
                "ref_chro": rec.target_name,
                "query_chro": rec.query_name,
            }
        )

    for op, n in op_runs:
        if op in "M=X":
            re_, qe = ref_off + n, q_off + n
            if not last_m:
                push(ref_off, re_, q_off, qe, "M")
            else:
                seg = out[-1]
                seg["ref_end"] = re_
                if negative:
                    seg["query_start"] = qe
                else:
                    seg["query_end"] = qe
            ref_off += n
            q_off += n
            last_m = True
        elif op == "I":
            qe = q_off + n
            if n > cutoff:
                push(ref_off, ref_off, q_off, qe, "I")
                last_m = False
            elif last_m:
                seg = out[-1]
                if negative:
                    seg["query_start"] = qe
                else:
                    seg["query_end"] = qe
            q_off += n
        elif op == "D":
            re_ = ref_off + n
            if n > cutoff:
                push(ref_off, re_, q_off, q_off, "D")
                last_m = False
            elif last_m:
                out[-1]["ref_end"] = re_
            ref_off += n
    return out


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("negative", [False, True])
def test_base_plotdata_matches_oracle(seed, negative):
    rng = random.Random(seed)
    runs = []
    prev = None
    for _ in range(rng.randint(1, 30)):
        op = rng.choice("MIDX=")
        while op == prev:
            op = rng.choice("MIDX=")
        runs.append((op, rng.randint(1, 80)))
        prev = op
    cutoff = rng.choice([0, 10, 50])
    rec = PafRecord(
        query_name="q",
        target_name="t",
        query_start=rng.randint(0, 500),
        target_start=rng.randint(0, 500),
        strand="-" if negative else "+",
    )
    got = base_plotdata_from_runs(runs, rec, cutoff)
    want = oracle_emit(runs, rec, cutoff)
    assert got == want
