"""pafpseudo tests against hand-derived expected output
(reference: src/tools/pseudomaf.rs semantics)."""

import io
import os

PAF = """\
qA\t12\t0\t5\t+\tt1\t20\t0\t5\t5\t5\t255\tcg:Z:5M
qA\t12\t5\t10\t+\tt1\t20\t8\t13\t5\t5\t255\tcg:Z:5M
qB\t10\t0\t7\t+\tt1\t20\t2\t7\t5\t7\t255\tcg:Z:3M2I2M
"""

T_FA = ">t1\nACGTACGTACGTACGTACGT\n>qA\nAAAAACCCCCTT\n>qB\nGGGGGGGTTT\n"


def run_pseudo(tmp_path, fasta):
    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.tools.pseudomaf import generate_pseudo_maf

    out_dir = tmp_path / "out"
    fa_path = None
    if fasta:
        fa = tmp_path / "all.fa"
        fa.write_text(T_FA)
        fa_path = str(fa)
    generate_pseudo_maf(
        PafReader(io.BytesIO(PAF.encode())), str(out_dir), fa_path, None
    )
    with open(out_dir / "t1.maf", "rb") as fp:
        return fp.read().decode()


def test_pseudomaf_with_fasta(tmp_path):
    got = run_pseudo(tmp_path, fasta=True)
    lines = got.splitlines()
    assert lines[0] == "a score=0"
    assert lines[1] == "s\tt1\t0\t20\t+\t20\tACGTACGTACGTACGTACGT"
    # qA: seg1 0-5, gap fill 5..8, seg2 8-13, tail fill to 20
    assert lines[2] == "s\tqA\t0\t12\t+\t12\tAAAAA---CCCCC-------"
    # qB: fill 0..2, 3M real + 2I dropped + 2M real = GGGGG, tail 20-7=13 gaps
    assert lines[3] == "s\tqB\t0\t10\t+\t10\t--GGGGG" + "-" * 13
    assert lines[4] == ""


def test_pseudomaf_symbols(tmp_path):
    got = run_pseudo(tmp_path, fasta=False)
    lines = got.splitlines()
    assert lines[1] == "s\tt1\t0\t20\t+\t20\t" + "N" * 20
    assert lines[2] == "s\tqA\t0\t12\t+\t12\t11111---11111-------"
    assert lines[3] == "s\tqB\t0\t10\t+\t10\t--11111" + "-" * 13


def test_pseudomaf_overlap_and_containment(tmp_path):
    """Head-trimmed overlaps and dropped contained segments
    (reference: pseudomaf.rs:140-205)."""
    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.tools.pseudomaf import generate_pseudo_maf

    paf = (
        "qA\t20\t0\t10\t+\tt1\t20\t0\t10\t10\t10\t255\tcg:Z:10M\n"
        # overlaps previous by 2 target bases -> head trim 2
        "qA\t20\t10\t16\t+\tt1\t20\t8\t14\t6\t6\t255\tcg:Z:6M\n"
        # fully contained in [8,14) -> dropped
        "qA\t20\t16\t18\t+\tt1\t20\t9\t11\t2\t2\t255\tcg:Z:2M\n"
    )
    out_dir = tmp_path / "o"
    generate_pseudo_maf(
        PafReader(io.BytesIO(paf.encode())), str(out_dir), None, None
    )
    with open(out_dir / "t1.maf") as fp:
        lines = fp.read().splitlines()
    # 10 ones + (6-2)=4 ones + tail 6 gaps
    assert lines[2].endswith("1" * 10 + "1" * 4 + "-" * 6)


def test_pseudomaf_target_select(tmp_path):
    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.tools.pseudomaf import generate_pseudo_maf

    paf = (
        "qA\t10\t0\t5\t+\tt1\t20\t0\t5\t5\t5\t255\tcg:Z:5M\n"
        "qA\t10\t0\t5\t+\tt2\t20\t0\t5\t5\t5\t255\tcg:Z:5M\n"
    )
    out_dir = tmp_path / "sel"
    generate_pseudo_maf(
        PafReader(io.BytesIO(paf.encode())), str(out_dir), None, "t2"
    )
    assert os.listdir(out_dir) == ["t2.maf"]
