"""BASELINE configs 3-4 at profiling scale (round-2 VERDICT #3).

Config 3: variant calling + region extraction on a chunked ~100 Mbp
chromosome MAF (the reference proves its workloads at ~Gbp scale,
/root/reference/benchmark.csv:2; caller.rs:109-149 is the chunk loop).
Config 4: pafcov + pafpseudo over an all-to-all PAF with 16 query
samples x 8 targets (pseudomaf.rs:24-74).

Each tool runs serial, -t4, and (where supported) WGA_TPU_DIST=1 with
2 processes; outputs are md5-cross-checked.  Results are recorded in
docs/SCALING.md.

Usage:  python scripts/scale_configs.py [--maf-cols N] [--out DIR]
(CPU run: the corpus is host-parser + fork-pool bound; device paths are
benched separately by bench.py.)
"""

import argparse
import hashlib
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV_BASE = {
    **os.environ,
    "PYTHONPATH": REPO,
    "JAX_PLATFORMS": "cpu",
}


def md5(path):
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def run(args, out_path, env=None, check=True):
    t0 = time.perf_counter()
    with open(out_path, "wb") as f:
        subprocess.run(
            [sys.executable, "-m", "wgatools_tpu", *args],
            stdout=f,
            stderr=subprocess.DEVNULL,
            env=env or ENV_BASE,
            check=check,
            cwd=REPO,
        )
    return time.perf_counter() - t0


def run_dist(args, out_path, nproc=2, port=12471):
    t0 = time.perf_counter()
    procs = []
    for pid in range(nproc):
        env = {
            **ENV_BASE,
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={nproc}",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": str(nproc),
            "JAX_PROCESS_ID": str(pid),
            "WGA_TPU_DIST": "1",
        }
        f = open(f"{out_path}.{pid}", "wb")
        procs.append(
            (
                subprocess.Popen(
                    [sys.executable, "-m", "wgatools_tpu", *args],
                    stdout=f,
                    stderr=subprocess.DEVNULL,
                    env=env,
                    cwd=REPO,
                ),
                f,
            )
        )
    for p, f in procs:
        rc = p.wait()
        f.close()
        assert rc == 0, f"dist proc failed rc={rc}"
    os.replace(f"{out_path}.0", out_path)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scale_corpus")
    ap.add_argument("--maf-records", type=int, default=128)
    ap.add_argument("--maf-cols", type=int, default=800_000)
    ap.add_argument("--paf-records", type=int, default=60_000)
    ap.add_argument("--paf-runs", type=int, default=60)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    print("building corpus ...", file=sys.stderr, flush=True)
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_corpus.py"),
            "--out", args.out,
            "--maf-records", str(args.maf_records),
            "--maf-cols", str(args.maf_cols),
            "--paf-records", str(args.paf_records),
            "--paf-runs", str(args.paf_runs),
        ],
        check=True,
        env=ENV_BASE,
    )
    maf = os.path.join(args.out, "big.maf")
    paf = os.path.join(args.out, "big.paf")
    mbp = args.maf_records * args.maf_cols / 1e6
    print(f"MAF ~{mbp:.0f} Mbp aligned columns", file=sys.stderr)

    rows = []

    def record(name, wall, note=""):
        rows.append((name, wall, note))
        print(f"{name:40s} {wall:8.1f} s  {note}", flush=True)

    # ---- config 3: index -> call -> maf-ext on the chromosome MAF ----
    w = run(["maf-index", maf], f"{args.out}/idx.out")
    record("maf-index", w)

    w = run(["call", maf, "-s", "-l0"], f"{args.out}/call.t1.vcf")
    record("call -s -l0 (serial)", w)
    w = run(["call", maf, "-s", "-l0", "-t", "4"], f"{args.out}/call.t4.vcf")
    eq = md5(f"{args.out}/call.t1.vcf") == md5(f"{args.out}/call.t4.vcf")
    record("call -s -l0 -t4", w, f"bytes==serial: {eq}")
    assert eq
    w = run_dist(["call", maf, "-s", "-l0"], f"{args.out}/call.dist.vcf")
    eq = md5(f"{args.out}/call.t1.vcf") == md5(f"{args.out}/call.dist.vcf")
    record("call -s -l0 WGA_TPU_DIST=1 x2", w, f"bytes==serial: {eq}")
    assert eq

    # region extraction across the whole chromosome
    regions = ",".join(
        f"ref.chr1:{s}-{s + 5000}" for s in range(2000, 40_000_000, 2_000_000)
    )
    w = run(["maf-ext", maf, "-r", regions], f"{args.out}/ext.maf")
    record("maf-ext (20 regions)", w, f"{md5(f'{args.out}/ext.maf')[:8]}")

    # chunk the chromosome (long-context analog)
    w = run(["chunk", maf, "-l", "100000"], f"{args.out}/chunk.maf")
    record("chunk -l 100000", w)

    # ---- config 4: pafcov + pafpseudo on the all-to-all PAF ----
    w = run(["pafcov", paf], f"{args.out}/cov.t1.bed")
    record("pafcov (serial)", w)
    w = run(["pafcov", paf, "-t", "4"], f"{args.out}/cov.t4.bed")
    eq = md5(f"{args.out}/cov.t1.bed") == md5(f"{args.out}/cov.t4.bed")
    record("pafcov -t4", w, f"bytes==serial: {eq}")
    assert eq
    w = run_dist(["pafcov", paf], f"{args.out}/cov.dist.bed")
    eq = md5(f"{args.out}/cov.t1.bed") == md5(f"{args.out}/cov.dist.bed")
    record("pafcov WGA_TPU_DIST=1 x2", w, f"bytes==serial: {eq}")
    assert eq

    def pseudo_dir_md5(d):
        parts = []
        for fn in sorted(os.listdir(d)):
            parts.append(fn + ":" + md5(os.path.join(d, fn)))
        return hashlib.md5("\n".join(parts).encode()).hexdigest()

    w = run(["pafpseudo", paf, "-o", f"{args.out}/pp.t1"], f"{args.out}/pp1.log")
    record("pafpseudo (serial, 16 samples x 8 targets)", w)
    w = run(
        ["pafpseudo", paf, "-t", "4", "-o", f"{args.out}/pp.t4"],
        f"{args.out}/pp4.log",
    )
    eq = pseudo_dir_md5(f"{args.out}/pp.t1") == pseudo_dir_md5(
        f"{args.out}/pp.t4"
    )
    record("pafpseudo -t4", w, f"dir-bytes==serial: {eq}")
    assert eq
    w = run_dist(
        ["pafpseudo", paf, "-o", f"{args.out}/pp.dist"],
        f"{args.out}/ppd.log",
    )
    eq = pseudo_dir_md5(f"{args.out}/pp.t1") == pseudo_dir_md5(
        f"{args.out}/pp.dist"
    )
    record("pafpseudo WGA_TPU_DIST=1 x2", w, f"dir-bytes==serial: {eq}")
    assert eq

    print("\n| run | wall | note |")
    print("|---|---|---|")
    for name, wall, note in rows:
        print(f"| `{name}` | {wall:.1f} s | {note} |")


if __name__ == "__main__":
    main()
