"""Four-process jax.distributed rehearsal (VERDICT r2 #5: scaling
evidence beyond 2 processes).

Same shape as test_distributed_2proc's CLI flows at twice the process
count: 4 real OS processes x 1 virtual CPU device, coordinator env vars,
WGA_TPU_DIST=1.  Process 0's stdout must be byte-identical to the serial
tool; the other three write nothing.  Covers the claim/allgather/merge
machinery at a process count where round-robin claims wrap (8 records
over 4 processes) and psum trees have real fan-in.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _repo():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_maf(tmp_path):
    from conftest import fixture_path

    src = open(fixture_path("test.maf"), "rb").read()
    header, _, body = src.partition(b"\n")
    parts = [header + b"\n"]
    for k in range(8):  # 8 records over 4 processes: claims wrap twice
        parts.append(
            body.replace(b"ref.chr8", b"ref.chr%d" % k).replace(
                b"query.chr8", b"query.chr%d" % k
            )
        )
    maf = tmp_path / "m.maf"
    maf.write_bytes(b"".join(parts))
    subprocess.run(
        [sys.executable, "-m", "wgatools_tpu", "maf-index", str(maf)],
        check=True,
        cwd=_repo(),
        env=dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu"),
    )
    return maf


def _serial(args):
    return subprocess.run(
        [sys.executable, "-m", "wgatools_tpu", *args],
        check=True,
        cwd=_repo(),
        env=dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu"),
        capture_output=True,
    ).stdout


def _dist4(args):
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
                [sys.executable, "-m", "wgatools_tpu", *args],
                env=env,
                cwd=_repo(),
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
    return outs


def test_four_process_distributed_stat_cli(tmp_path):
    maf = _make_maf(tmp_path)
    serial = _serial(["stat", str(maf)])
    outs = _dist4(["stat", str(maf)])
    assert outs[0][1] == serial
    for rc, out, _ in outs[1:]:
        assert out == b""


def test_four_process_distributed_call_cli(tmp_path):
    maf = _make_maf(tmp_path)
    serial = _serial(["call", str(maf), "-s", "-l0"])
    outs = _dist4(["call", str(maf), "-s", "-l0"])
    assert outs[0][1] == serial
    for rc, out, _ in outs[1:]:
        assert out == b""
