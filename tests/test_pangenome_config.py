"""BASELINE config 4 in miniature: all-to-all pangenome PAF (8 samples)
through pafcov, pafpseudo, and filter -a."""

import io
import os
import random

from wgatools_tpu.io.paf import PafReader
from wgatools_tpu.tools.filter import filter_paf_align_pair
from wgatools_tpu.tools.pafcov import pafcov
from wgatools_tpu.tools.pseudomaf import generate_pseudo_maf

N_SAMPLES = 8
TARGET_LEN = 2000


def make_all_to_all_paf(seed=0):
    """Each sample aligns 2-3 segments to the target chromosome."""
    rng = random.Random(seed)
    rows = []
    for s in range(1, N_SAMPLES + 1):
        t_pos = rng.randint(0, 100)
        q_pos = 0
        for _ in range(rng.randint(2, 3)):
            span = rng.randint(100, 400)
            if t_pos + span > TARGET_LEN:
                break
            rows.append(
                f"sample{s}#chr1\t5000\t{q_pos}\t{q_pos + span}\t+\t"
                f"ref#chr1\t{TARGET_LEN}\t{t_pos}\t{t_pos + span}\t"
                f"{span}\t{span}\t255\tcg:Z:{span}M"
            )
            t_pos += span + rng.randint(10, 200)
            q_pos += span + rng.randint(0, 50)
    return "\n".join(rows) + "\n"


def test_pangenome_cov_pseudo_filter(tmp_path):
    paf = make_all_to_all_paf()

    # coverage: per-base counts sum to total aligned span
    cov_out = io.BytesIO()
    pafcov(PafReader(io.BytesIO(paf.encode())), cov_out)
    lines = cov_out.getvalue().decode().splitlines()
    assert len(lines) == TARGET_LEN  # one row per target base
    covered = sum(int(l.split("\t")[3]) for l in lines)
    spans = sum(
        int(r.split("\t")[3]) - int(r.split("\t")[2])
        for r in paf.splitlines()
    )
    assert covered == spans

    # pseudo-MAF: one row per sample + target row
    out_dir = tmp_path / "pp"
    generate_pseudo_maf(
        PafReader(io.BytesIO(paf.encode())), str(out_dir), None, None
    )
    maf_lines = open(out_dir / "ref#chr1.maf").read().splitlines()
    s_lines = [l for l in maf_lines if l.startswith("s\t")]
    assert len(s_lines) == N_SAMPLES + 1
    # every row spans the whole target axis
    for l in s_lines:
        assert len(l.split("\t")[6]) == TARGET_LEN

    # filter -a: pairs below the summed-span threshold drop entirely
    flt = io.BytesIO()
    filter_paf_align_pair(PafReader(io.BytesIO(paf.encode())), flt, 600)
    kept_pairs = {
        l.split("\t")[0] for l in flt.getvalue().decode().splitlines()
    }
    for r in paf.splitlines():
        f = r.split("\t")
        pair_total = sum(
            int(x.split("\t")[8]) - int(x.split("\t")[7])
            for x in paf.splitlines()
            if x.split("\t")[0] == f[0]
        )
        if pair_total >= 600:
            assert f[0] in kept_pairs
        else:
            assert f[0] not in kept_pairs
