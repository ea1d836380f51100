"""Full-pipeline integration (BASELINE config 5 in miniature):
convert + call + stat + cov over a multi-chromosome synthetic genome,
composed through real file formats."""

import io
import random

import pytest

from synth import build_alignment, random_ops

from wgatools_tpu.io.maf import MafReader
from wgatools_tpu.io.paf import PafReader
from wgatools_tpu.tools import convert
from wgatools_tpu.tools.caller import call_var_maf
from wgatools_tpu.tools.pafcov import pafcov
from wgatools_tpu.tools.stat import stat_maf, stat_paf


def make_genome_maf(seed, n_chroms=3, recs_per_chrom=4):
    rng = random.Random(seed)
    lines = ["#maf version=1.6 synthetic"]
    for c in range(1, n_chroms + 1):
        t_start = rng.randint(0, 1000)
        q_start = rng.randint(0, 1000)
        for _ in range(recs_per_chrom):
            ops = random_ops(rng, rng.randint(3, 10))
            t_aln, q_aln = build_alignment(rng, ops)
            t_sz = sum(1 for ch in t_aln if ch != "-")
            q_sz = sum(1 for ch in q_aln if ch != "-")
            lines.append("a score=0")
            lines.append(
                f"s\tref.chr{c}\t{t_start}\t{t_sz}\t+\t50000\t{t_aln}"
            )
            lines.append(
                f"s\tqry.chr{c}\t{q_start}\t{q_sz}\t+\t50000\t{q_aln}"
            )
            lines.append("")
            t_start += t_sz + rng.randint(0, 50)
            q_start += q_sz + rng.randint(0, 50)
    return ("\n".join(lines) + "\n").encode()


@pytest.mark.parametrize("seed", [0, 1])
def test_full_pipeline(seed):
    maf_bytes = make_genome_maf(seed)

    # 1. convert maf -> paf
    paf_out = io.BytesIO()
    convert.maf2paf(MafReader(io.BytesIO(maf_bytes)), paf_out)
    paf_bytes = paf_out.getvalue()
    n_records = len(paf_bytes.splitlines())
    assert n_records == 12

    # 2. paf -> chain -> paf is stable after one normalization
    chain_out = io.BytesIO()
    convert.paf2chain(PafReader(io.BytesIO(paf_bytes)), chain_out)
    from wgatools_tpu.io.chain import ChainReader

    paf2 = io.BytesIO()
    convert.chain2paf(ChainReader(io.BytesIO(chain_out.getvalue())), paf2)
    chain2 = io.BytesIO()
    convert.paf2chain(PafReader(io.BytesIO(paf2.getvalue())), chain2)
    assert chain_out.getvalue() == chain2.getvalue()

    # 3. stat: maf stats and paf stats agree on shared integer columns
    maf_stat = io.BytesIO()
    stat_maf(MafReader(io.BytesIO(maf_bytes)), maf_stat, device=False)
    paf_stat = io.BytesIO()
    stat_paf(PafReader(io.BytesIO(paf_bytes)), paf_stat)
    rows_maf = sorted(maf_stat.getvalue().decode().splitlines()[1:])
    rows_paf = sorted(paf_stat.getvalue().decode().splitlines()[1:])
    assert rows_maf == rows_paf

    # 4. call: SNP totals equal the stat mismatch totals
    vcf_out = io.BytesIO()
    call_var_maf(
        MafReader(io.BytesIO(maf_bytes)), None, vcf_out, True, False, 0
    )
    body = [
        l
        for l in vcf_out.getvalue().decode().splitlines()
        if l and not l.startswith("#")
    ]
    snp_rows = [r for r in body if "SVTYPE" not in r]
    total_mismatch = sum(
        int(r.split("\t")[11]) for r in rows_maf  # mismatched column
    )
    assert len(snp_rows) == total_mismatch
    # VCF rows are coordinate-sorted within each chromosome
    by_chrom = {}
    for r in body:
        fields = r.split("\t")
        by_chrom.setdefault(fields[0], []).append(int(fields[1]))
    for poss in by_chrom.values():
        assert poss == sorted(poss)

    # 5. pafcov: covered-base total equals summed M spans
    cov_out = io.BytesIO()
    pafcov(PafReader(io.BytesIO(paf_bytes)), cov_out)
    covered = 0
    for line in cov_out.getvalue().decode().splitlines():
        covered += int(line.split("\t")[3])
    # update_cov_vec covers only M/'=' spans; X advances without counting
    # (reference: cigar.rs:721-734), so coverage == matched bases only
    expect = sum(int(r.split("\t")[10]) for r in rows_maf)
    assert covered == expect
