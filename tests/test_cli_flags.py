"""Exact short-flag surface parity (reference: src/cli.rs).

chain2maf takes `-t <target>` (cli.rs:86-88) and maf-ext takes
`-r <regions>` comma-delimited (cli.rs:114-117); within those
subcommands the local flag shadows the global -t/--threads and
-r/--rewrite shorts, exactly as clap resolves the conflict, while the
globals stay reachable long-form.
"""

from wgatools_tpu.cli import build_parser


def test_chain2maf_dash_t_is_target():
    args = build_parser().parse_args(
        ["chain2maf", "in.chain", "-t", "t.fa", "-q", "q.fa"]
    )
    assert args.target == "t.fa"
    assert args.threads == 1  # global default still present


def test_chain2maf_threads_long_form():
    args = build_parser().parse_args(
        ["chain2maf", "-t", "t.fa", "-q", "q.fa", "--threads", "4"]
    )
    assert args.threads == 4
    # compat alias from earlier releases
    args = build_parser().parse_args(["c2m", "-g", "t.fa", "-q", "q.fa"])
    assert args.target == "t.fa"


def test_mafext_dash_r_is_regions_comma_delimited():
    args = build_parser().parse_args(
        ["maf-ext", "in.maf", "-r", "chr1:1-10,chr2:5-9"]
    )
    assert args.regions == "chr1:1-10,chr2:5-9"
    assert args.regions.split(",") == ["chr1:1-10", "chr2:5-9"]
    assert args.rewrite is False
    args = build_parser().parse_args(
        ["maf-ext", "in.maf", "--rewrite", "-r", "chr1:1-10"]
    )
    assert args.rewrite is True
    # compat alias
    args = build_parser().parse_args(["me", "in.maf", "-R", "chr1:1-10"])
    assert args.regions == "chr1:1-10"


def test_global_shorts_unshadowed_elsewhere():
    args = build_parser().parse_args(["maf2paf", "in.maf", "-t", "8", "-r"])
    assert args.threads == 8
    assert args.rewrite is True
