"""Two-process jax.distributed rehearsal (VERDICT r1 #6).

Launches 2 real OS processes with coordinator env vars, each exposing 2
virtual CPU devices, so a single 4-device mesh spans both processes.  Each
process claims its work units from a shared MAF-index manifest
(claim_work_units), contributes only its own records' data to the global
sharded arrays, and runs the production collectives
(sharded_pair_reduce's segment-sum + psum, sharded_coverage's psum'd
difference array).  The replicated outputs must equal a single-process
numpy oracle in BOTH processes.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np

from wgatools_tpu.parallel.distributed import (
    claim_work_units,
    maybe_initialize_distributed,
)

assert maybe_initialize_distributed(), "env vars missing"
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from wgatools_tpu.parallel.mesh import (
    RECORDS_AXIS,
    sharded_coverage,
    sharded_pair_reduce,
)
from jax.sharding import Mesh

pid = jax.process_index()
nproc = jax.process_count()
assert nproc == 2, nproc
devices = jax.devices()
assert len(devices) == 4, devices
mesh = Mesh(np.array(devices), (RECORDS_AXIS,))

# shared manifest: 8 units; both processes derive the same deterministic
# assignment (claim_work_units round-robin by offset)
index = {
    "chr1": {
        "isref": True,
        "size": 1000,
        "ivls": [
            {"start": 10 * k, "end": 10 * k + 7, "strand": "+", "offset": k}
            for k in range(8)
        ],
    }
}
mine = claim_work_units(index, pid, nproc)
assert len(mine) == 4

# global layout: process p's units occupy rows [4p, 4p+4) -- each process
# fills ONLY its own half from its claimed units
starts_g = np.zeros(8, dtype=np.int32)
ends_g = np.zeros(8, dtype=np.int32)
stats_g = np.zeros((8, 8), dtype=np.int32)
ids_g = np.zeros(8, dtype=np.int32)
for j, (name, s, e, off) in enumerate(mine):
    starts_g[4 * pid + j] = s
    ends_g[4 * pid + j] = e
    stats_g[4 * pid + j] = off + 1
    ids_g[4 * pid + j] = off % 3

sh1 = NamedSharding(mesh, P(RECORDS_AXIS))
sh2 = NamedSharding(mesh, P(RECORDS_AXIS, None))

def mk(arr, sh):
    return jax.make_array_from_callback(
        arr.shape, sh, lambda idx: arr[idx]
    )

starts_d = mk(starts_g, sh1)
ends_d = mk(ends_g, sh1)
stats_d = mk(stats_g, sh2)
ids_d = mk(ids_g, sh1)

pair_table = sharded_pair_reduce(mesh, stats_d, ids_d, 3)
coverage = sharded_coverage(mesh, starts_d, ends_d, 100)

# oracle: the FULL manifest (all processes' units), derivable by anyone
all_units = sorted(
    ((iv["start"], iv["end"], iv["offset"]) for iv in index["chr1"]["ivls"]),
    key=lambda u: u[2],
)
want_cov = np.zeros(100, dtype=np.int64)
want_pairs = np.zeros((3, 8), dtype=np.int64)
for s, e, off in all_units:
    want_cov[s:e] += 1
    want_pairs[off % 3] += off + 1

got_pairs = np.asarray(jax.device_get(pair_table))
got_cov = np.asarray(jax.device_get(coverage))
assert np.array_equal(got_pairs, want_pairs), (pid, got_pairs, want_pairs)
assert np.array_equal(got_cov, want_cov.astype(np.int32)), pid
print(f"proc {pid}: merged tables OK", flush=True)
"""


def test_two_process_distributed_merge(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            PYTHONPATH="",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, err
    assert "proc 0: merged tables OK" in outs[0][1]
    assert "proc 1: merged tables OK" in outs[1][1]


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_stat_cli(tmp_path):
    """End-to-end distributed tool flow: `WGA_TPU_DIST=1 wgatools-tpu
    stat` across 2 processes must write (from process 0) exactly the
    serial tool's bytes."""
    import shutil

    from conftest import fixture_path

    # multi-record MAF + index
    src = open(fixture_path("test.maf"), "rb").read()
    header, _, body = src.partition(b"\n")
    body2 = body.replace(b"ref.chr8", b"ref.chr9").replace(
        b"query.chr8", b"query.chr9"
    )
    maf = tmp_path / "m.maf"
    maf.write_bytes(header + b"\n" + body + body2 + body)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, "-m", "wgatools_tpu", "maf-index", str(maf)],
        check=True,
        cwd=repo,
        env=dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu"),
    )
    serial = subprocess.run(
        [sys.executable, "-m", "wgatools_tpu", "stat", str(maf)],
        check=True,
        cwd=repo,
        env=dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu"),
        capture_output=True,
    ).stdout

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            PYTHONPATH="",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            WGA_TPU_DIST="1",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "wgatools_tpu", "stat", str(maf)],
                env=env,
                cwd=repo,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, _, err in outs:
        assert rc == 0, err.decode()
    assert outs[0][1] == serial  # process 0 writes the merged table
    assert outs[1][1] == b""  # other processes write nothing


def test_two_process_distributed_pafcov_cli(tmp_path):
    """Distributed pafcov: 2 processes, psum-merged per-target coverage;
    process 0's stdout byte-identical to the serial tool."""
    import random

    rng = random.Random(3)
    rows = []
    for i in range(19):
        ops, last = [], None
        for _ in range(rng.randint(2, 9)):
            op = rng.choice([o for o in "MID" if o != last])
            last = op
            ops.append((op, rng.randint(1, 30)))
        q = sum(n for o, n in ops if o in "MI")
        t = sum(n for o, n in ops if o in "MD")
        cg = "".join(f"{n}{o}" for o, n in ops)
        rows.append(
            f"q{i}\t900\t0\t{q}\t+\tt{i % 3}\t900\t{i * 5}\t{i * 5 + t}"
            f"\t{t}\t{t}\t255\tcg:Z:{cg}"
        )
    paf = tmp_path / "c.paf"
    paf.write_text("\n".join(rows) + "\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    serial = subprocess.run(
        [sys.executable, "-m", "wgatools_tpu", "pafcov", str(paf)],
        check=True,
        cwd=repo,
        env=base_env,
        capture_output=True,
    ).stdout

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            base_env,
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            WGA_TPU_DIST="1",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "wgatools_tpu", "pafcov", str(paf)],
                env=env,
                cwd=repo,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, _, err in outs:
        assert rc == 0, err.decode()
    assert outs[0][1] == serial
    assert outs[1][1] == b""
    assert serial  # non-empty coverage


def test_two_process_distributed_validate_cli(tmp_path):
    """Distributed validate incl. -f fixed output; process 0's report and
    fixed PAF byte-identical to the serial tool."""
    import random

    rng = random.Random(17)
    rows = []
    for i in range(13):
        m = rng.randint(5, 40)
        ins = rng.randint(1, 9)
        q = m + ins
        t = m
        q_end = q + (rng.randint(1, 4) if i % 3 == 0 else 0)  # corrupt some
        rows.append(
            f"q{i}\t500\t0\t{q_end}\t+\tt{i % 2}\t500\t0\t{t}\t{m}\t{q}"
            f"\t255\tcg:Z:{m}M{ins}I"
        )
    paf = tmp_path / "v.paf"
    paf.write_text("\n".join(rows) + "\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")

    def run_validate(env, fix_path):
        return subprocess.run(
            [
                sys.executable,
                "-m",
                "wgatools_tpu",
                "validate",
                str(paf),
                "-f",
                fix_path,
            ],
            cwd=repo,
            env=env,
            capture_output=True,
        )

    serial = run_validate(base_env, str(tmp_path / "fix_serial.paf"))
    assert serial.returncode == 0, serial.stderr.decode()

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            base_env,
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            WGA_TPU_DIST="1",
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "wgatools_tpu",
                    "validate",
                    str(paf),
                    "-f",
                    str(tmp_path / f"fix_dist_{pid}.paf"),
                ],
                cwd=repo,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, _, err in outs:
        assert rc == 0, err.decode()
    assert outs[0][1] == serial.stdout
    assert b"invalid" in serial.stdout
    assert (tmp_path / "fix_dist_0.paf").read_bytes() == (
        tmp_path / "fix_serial.paf"
    ).read_bytes()


def test_two_process_distributed_call_cli(tmp_path):
    """Distributed call: claimed records' VCF rows allgathered and merged
    in record order; process 0's output byte-identical to serial call."""
    from conftest import fixture_path

    src = open(fixture_path("test.maf"), "rb").read()
    header, _, body = src.partition(b"\n")
    body2 = body.replace(b"ref.chr8", b"ref.chr9").replace(
        b"query.chr8", b"query.chr9"
    )
    maf = tmp_path / "c.maf"
    maf.write_bytes(header + b"\n" + body + body2 + body)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "wgatools_tpu", "maf-index", str(maf)],
        check=True,
        cwd=repo,
        env=base_env,
    )
    serial = subprocess.run(
        [sys.executable, "-m", "wgatools_tpu", "call", str(maf), "-s", "-l0"],
        check=True,
        cwd=repo,
        env=base_env,
        capture_output=True,
    ).stdout

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            base_env,
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            WGA_TPU_DIST="1",
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "wgatools_tpu",
                    "call",
                    str(maf),
                    "-s",
                    "-l0",
                ],
                cwd=repo,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, _, err in outs:
        assert rc == 0, err.decode()
    assert outs[0][1] == serial
    assert outs[1][1] == b""
    assert b"##contig" in serial and serial.count(b"\n") > 20


def _run_dist_cli(argv, tmp_env_extra=None, timeout=200):
    """Run the same CLI command in 2 coordinated processes; returns
    [(rc, stdout, stderr)] in pid order."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            PYTHONPATH="",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            WGA_TPU_DIST="1",
            **(tmp_env_extra or {}),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "wgatools_tpu", *argv],
                env=env,
                cwd=repo,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    return outs


def _serial_cli(argv):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.run(
        [sys.executable, "-m", "wgatools_tpu", *argv],
        check=True,
        cwd=repo,
        env=dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu"),
        capture_output=True,
    ).stdout


def test_two_process_distributed_stat_indexless(tmp_path):
    """Distributed stat without a MAF index falls back to the raw offset
    manifest (striped claims) -- same merged table as serial."""
    from conftest import fixture_path

    src = open(fixture_path("test.maf"), "rb").read()
    header, _, body = src.partition(b"\n")
    body2 = body.replace(b"ref.chr8", b"ref.chr9").replace(
        b"query.chr8", b"query.chr9"
    )
    maf = tmp_path / "noidx.maf"
    maf.write_bytes(header + b"\n" + body + body2 + body)
    serial = _serial_cli(["stat", str(maf)])
    outs = _run_dist_cli(["stat", str(maf)])
    for rc, _, err in outs:
        assert rc == 0, err.decode()
    assert outs[0][1] == serial
    assert outs[1][1] == b""


def test_two_process_distributed_maf2paf_cli(tmp_path):
    """Distributed maf2paf: contiguous record ranges, gathered chunks;
    process 0's stdout byte-identical to the serial tool."""
    from conftest import fixture_path

    src = open(fixture_path("test.maf"), "rb").read()
    header, _, body = src.partition(b"\n")
    body2 = body.replace(b"ref.chr8", b"ref.chr9").replace(
        b"query.chr8", b"query.chr9"
    )
    maf = tmp_path / "m.maf"
    maf.write_bytes(header + b"\n" + body + body2 + body)
    serial = _serial_cli(["maf2paf", str(maf)])
    outs = _run_dist_cli(["maf2paf", str(maf)])
    for rc, _, err in outs:
        assert rc == 0, err.decode()
    assert outs[0][1] == serial
    assert outs[1][1] == b""

    serial_chain = _serial_cli(["maf2chain", str(maf)])
    outs = _run_dist_cli(["maf2chain", str(maf)])
    for rc, _, err in outs:
        assert rc == 0, err.decode()
    assert outs[0][1] == serial_chain
    assert outs[1][1] == b""


def test_two_process_distributed_converters_cli(tmp_path):
    """Distributed paf2chain and chain2paf: byte-identical to serial,
    chain ids continuing the serial numbering across process ranges."""
    from conftest import fixture_path

    paf_src = open(fixture_path("testdotplot.paf"), "rb").read()
    paf = tmp_path / "d.paf"
    paf.write_bytes(paf_src * 3)
    serial_chain = _serial_cli(["paf2chain", str(paf)])
    outs = _run_dist_cli(["paf2chain", str(paf)])
    for rc, _, err in outs:
        assert rc == 0, err.decode()
    assert outs[0][1] == serial_chain
    assert outs[1][1] == b""

    chain = tmp_path / "d.chain"
    chain.write_bytes(serial_chain)
    serial_paf = _serial_cli(["chain2paf", str(chain)])
    outs = _run_dist_cli(["chain2paf", str(chain)])
    for rc, _, err in outs:
        assert rc == 0, err.decode()
    assert outs[0][1] == serial_paf
    assert outs[1][1] == b""


def test_two_process_distributed_file_output(tmp_path):
    """-o file output in distributed mode: only process 0 opens the real
    output (a non-zero rank hitting the overwrite guard would exit before
    its first collective and hang the survivor)."""
    from conftest import fixture_path

    src = open(fixture_path("test.maf"), "rb").read()
    maf = tmp_path / "m.maf"
    maf.write_bytes(src)
    serial = _serial_cli(["maf2paf", str(maf)])
    out_paf = tmp_path / "out.paf"
    outs = _run_dist_cli(["maf2paf", str(maf), "-o", str(out_paf)])
    for rc, _, err in outs:
        assert rc == 0, err.decode()
    assert out_paf.read_bytes() == serial


def test_two_process_distributed_pafpseudo(tmp_path):
    """Distributed pafpseudo stripes targets across processes; the output
    directory content equals the serial run's."""
    from conftest import fixture_path

    paf_src = open(fixture_path("testdotplot.paf"), "rb").read()
    # two targets so both processes get work
    paf = tmp_path / "p.paf"
    paf.write_bytes(paf_src + paf_src.replace(b"B\t", b"C\t"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    serial_dir = tmp_path / "serial"
    subprocess.run(
        [sys.executable, "-m", "wgatools_tpu", "pafpseudo", str(paf),
         "-o", str(serial_dir)],
        check=True, cwd=repo,
        env=dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu"),
    )
    dist_dir = tmp_path / "dist"
    outs = _run_dist_cli(
        ["pafpseudo", str(paf), "-o", str(dist_dir)]
    )
    for rc, _, err in outs:
        assert rc == 0, err.decode()
    serial_files = sorted(os.listdir(serial_dir))
    assert sorted(os.listdir(dist_dir)) == serial_files
    for name in serial_files:
        assert (dist_dir / name).read_bytes() == (
            serial_dir / name
        ).read_bytes()


def test_two_process_distributed_filter_align_pair(tmp_path):
    """Distributed filter -a: keyed-map sums merge via allgather; kept
    rows concatenate in file order -- byte-identical to serial."""
    from conftest import fixture_path

    paf_src = open(fixture_path("testdotplot.paf"), "rb").read()
    paf = tmp_path / "f.paf"
    paf.write_bytes(paf_src + paf_src.replace(b"B\t", b"C\t") * 2)
    serial = _serial_cli(["filter", "-f", "paf", "-a", "300", str(paf)])
    outs = _run_dist_cli(["filter", "-f", "paf", "-a", "300", str(paf)])
    for rc, _, err in outs:
        assert rc == 0, err.decode()
    assert outs[0][1] == serial
    assert outs[1][1] == b""


def test_two_process_distributed_stat_paf(tmp_path):
    """Distributed stat -f paf over line ranges: merged table identical
    to the serial tool."""
    from conftest import fixture_path

    paf_src = open(fixture_path("testdotplot.paf"), "rb").read()
    paf = tmp_path / "s.paf"
    paf.write_bytes(paf_src * 4)
    serial = _serial_cli(["stat", "-f", "paf", str(paf)])
    outs = _run_dist_cli(["stat", "-f", "paf", str(paf)])
    for rc, _, err in outs:
        assert rc == 0, err.decode()
    assert outs[0][1] == serial
    assert outs[1][1] == b""


def test_two_process_distributed_dotplot(tmp_path):
    """Distributed dotplot: rows gathered across processes; process 0's
    rendered output (csv + html) byte-identical to serial."""
    from conftest import fixture_path

    paf_src = open(fixture_path("testdotplot.paf"), "rb").read()
    paf = tmp_path / "d.paf"
    paf.write_bytes(paf_src * 3)
    for fmt in ("csv", "html"):
        serial = _serial_cli(
            ["dotplot", "-f", "paf", str(paf), "--out_format", fmt]
        )
        outs = _run_dist_cli(
            ["dotplot", "-f", "paf", str(paf), "--out_format", fmt]
        )
        for rc, _, err in outs:
            assert rc == 0, err.decode()
        assert outs[0][1] == serial, fmt


def test_three_process_distributed_maf2paf(tmp_path):
    """Uneven splits: 3 processes over 3 records (and over 2-target
    manifests elsewhere) must still concatenate to the serial bytes."""
    from conftest import fixture_path

    src = open(fixture_path("test.maf"), "rb").read()
    header, _, body = src.partition(b"\n")
    body2 = body.replace(b"ref.chr8", b"ref.chr9")
    body3 = body.replace(b"ref.chr8", b"ref.chr10")
    maf = tmp_path / "m3.maf"
    maf.write_bytes(header + b"\n" + body + body2 + body3)
    serial = _serial_cli(["maf2paf", str(maf)])

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    procs = []
    for pid in range(3):
        env = dict(
            os.environ,
            PYTHONPATH="",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="3",
            JAX_PROCESS_ID=str(pid),
            WGA_TPU_DIST="1",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "wgatools_tpu", "maf2paf", str(maf)],
                env=env,
                cwd=repo,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, _, err in outs:
        assert rc == 0, err.decode()
    assert outs[0][1] == serial
    assert outs[1][1] == b"" and outs[2][1] == b""


def test_claimed_offsets_partition(tmp_path):
    """_claimed_offsets partitions the record set exactly (no overlap, no
    loss) for any nproc, with and without an index manifest."""
    from conftest import fixture_path

    from wgatools_tpu.parallel.dist_tools import _claimed_offsets
    from wgatools_tpu.parallel.host_pool import maf_record_offsets

    src = open(fixture_path("test.maf"), "rb").read()
    header, _, body = src.partition(b"\n")
    parts = [body]
    for c in range(9, 14):
        parts.append(body.replace(b"chr8", f"chr{c}".encode()))
    maf = tmp_path / "many.maf"
    maf.write_bytes(header + b"\n" + b"".join(parts))

    all_offsets = set(maf_record_offsets(str(maf)))
    assert len(all_offsets) == 6
    for nproc in (1, 2, 3, 4, 7):
        claimed = [
            _claimed_offsets(str(maf), pid, nproc) for pid in range(nproc)
        ]
        flat = [o for c in claimed for o in c]
        assert len(flat) == len(set(flat))  # disjoint
        assert set(flat) == all_offsets     # complete

    # with an index: same partition properties
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, "-m", "wgatools_tpu", "maf-index", str(maf)],
        check=True, cwd=repo,
        env=dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu"),
    )
    # index offsets point at the a-line (record start) rather than the
    # first s-line -- both are valid seek targets; assert the partition
    # is disjoint, complete, and lands on parseable records
    from wgatools_tpu.io.maf import MafReader

    for nproc in (1, 2, 3):
        claimed = [
            _claimed_offsets(str(maf), pid, nproc) for pid in range(nproc)
        ]
        flat = [o for c in claimed for o in c]
        assert len(flat) == len(set(flat)) == 6
        reader = MafReader.from_path(str(maf))
        names = set()
        for off in flat:
            reader.seek(off)
            rec = reader.next_record()
            assert rec is not None
            names.add(rec.target_name)
        assert len(names) == 6


def test_four_process_distributed_stat_cli(tmp_path):
    """4-process variant (round-2 VERDICT #5): one virtual device per
    process, 4-device mesh spanning all four; process 0's stdout must be
    byte-identical to the serial tool, others silent."""
    from conftest import fixture_path

    src = open(fixture_path("test.maf"), "rb").read()
    header, _, body = src.partition(b"\n")
    blocks = [
        body.replace(b"chr8", b"chr%d" % k) for k in (8, 9, 10, 11, 12)
    ]
    maf = tmp_path / "m4.maf"
    maf.write_bytes(header + b"\n" + b"".join(blocks))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, "-m", "wgatools_tpu", "maf-index", str(maf)],
        check=True,
        cwd=repo,
        env=dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu"),
    )
    serial = subprocess.run(
        [sys.executable, "-m", "wgatools_tpu", "stat", str(maf)],
        check=True,
        cwd=repo,
        env=dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu"),
        capture_output=True,
    ).stdout

    port = _free_port()
    procs = []
    for pid in range(4):
        env = dict(
            os.environ,
            PYTHONPATH="",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="4",
            JAX_PROCESS_ID=str(pid),
            WGA_TPU_DIST="1",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "wgatools_tpu", "stat", str(maf)],
                env=env,
                cwd=repo,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, _, err in outs:
        assert rc == 0, err.decode()
    assert outs[0][1] == serial
    for rc, out, _ in outs[1:]:
        assert out == b""
