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


def test_launcher_strips_axon_unless_device_or_dist_mode(tmp_path):
    """The bin/wgatools-tpu shell launcher must unset
    PALLAS_AXON_POOL_IPS (the sitecustomize trigger costing ~1.9 s of
    axon/jax registration in EVERY interpreter) for ALL subcommands
    when neither WGA_TPU_DEVICE nor WGA_TPU_DIST is set -- device paths
    can only engage through those env vars in a fresh CLI process
    (core/device.py).  JAX_PLATFORMS=cpu is pinned only when the user
    has not set it.  (VERDICT r4 #8.)  A stub `python` on PATH captures
    the env the launcher execs with."""
    import os
    import stat as statmod
    import subprocess

    launcher = os.path.join(
        os.path.dirname(__file__), "..", "bin", "wgatools-tpu"
    )
    # the launcher prefers $script_dir/python, then python3 on PATH --
    # stub BOTH names so resolution lands on the stub either way
    for name in ("python", "python3"):
        stub = tmp_path / name
        stub.write_text(
            "#!/bin/bash\n"
            'echo "POOL=${PALLAS_AXON_POOL_IPS-UNSET} JAX=${JAX_PLATFORMS-UNSET}"\n'
        )
        stub.chmod(stub.stat().st_mode | statmod.S_IEXEC)

    def run(args, extra_env=()):
        env = dict(os.environ, PATH=f"{tmp_path}:" + os.environ["PATH"],
                   PALLAS_AXON_POOL_IPS="1.2.3.4")
        for k in ("WGA_TPU_DEVICE", "WGA_TPU_DIST", "JAX_PLATFORMS"):
            env.pop(k, None)
        env.update(dict(extra_env))
        out = subprocess.run(["bash", launcher] + args, env=env,
                             capture_output=True, text=True, check=True)
        return out.stdout.strip()

    # no device/dist opt-in: trigger stripped, cpu pinned -- for EVERY
    # subcommand (device paths cannot engage without the env vars)
    assert run(["filter", "x.maf"]) == "POOL=UNSET JAX=cpu"
    assert run(["stat", "x.maf"]) == "POOL=UNSET JAX=cpu"
    assert run(["maf2paf", "x.maf"]) == "POOL=UNSET JAX=cpu"
    # a user-set JAX_PLATFORMS wins
    assert run(["stat", "x.maf"], {"JAX_PLATFORMS": "tpu"}) == (
        "POOL=UNSET JAX=tpu"
    )
    # WGA_TPU_DEVICE / WGA_TPU_DIST keep the TPU registration
    assert run(["stat", "x.maf"], {"WGA_TPU_DEVICE": "1"}).startswith(
        "POOL=1.2.3.4"
    )
    assert run(["stat", "x.maf"], {"WGA_TPU_DIST": "1"}).startswith(
        "POOL=1.2.3.4"
    )
    # explicit opt-OUT values must strip too (device_requested treats
    # '', '0', 'false' as disabled -- round-5 review finding)
    assert run(["stat", "x.maf"], {"WGA_TPU_DEVICE": "0"}) == (
        "POOL=UNSET JAX=cpu"
    )
    assert run(["stat", "x.maf"], {"WGA_TPU_DEVICE": "false"}) == (
        "POOL=UNSET JAX=cpu"
    )
