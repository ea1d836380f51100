"""Multi-host initialization and genome-axis work partitioning.

The reference has no distributed runtime (SURVEY.md §2.12); here multi-host
runs use jax.distributed so a single mesh spans all hosts' devices (ICI
within a slice, DCN across hosts).  Work units come from the MAF index --
(sequence, interval, byte offset) tuples -- so hosts claim disjoint record
ranges and restart is re-reading the manifest (SURVEY.md §5).
"""

import logging
import os

log = logging.getLogger(__name__)


def maybe_initialize_distributed():
    """Initialize jax.distributed from the standard env vars when present.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID (or
    cloud-TPU autodetection when none are set but a pod slice is attached).
    Safe to call unconditionally; no-ops on single-host runs.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if not (addr and nproc and pid):
        return False
    import jax

    # C++ backends (gloo) print banners straight to fd 1; tool output is
    # piped, so keep stdout byte-clean by parking fd 1 on stderr during
    # initialization
    import sys

    sys.stdout.flush()
    saved = os.dup(1)
    try:
        os.dup2(2, 1)
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    finally:
        os.dup2(saved, 1)
        os.close(saved)
    log.info(
        "jax.distributed initialized: process %s/%s via %s", pid, nproc, addr
    )
    return True


def claim_work_units(mafindex, process_id: int, num_processes: int):
    """Partition the index's (name, interval, offset) units across hosts.

    Deterministic round-robin over offset-sorted units: every host derives
    the same assignment from the shared manifest, so there is no coordinator
    state to lose -- restart re-reads the index (SURVEY.md §5 checkpoint
    analog).
    """
    units = []
    for name, item in mafindex.items():
        if not item["isref"]:
            continue
        for iv in item["ivls"]:
            units.append((name, iv["start"], iv["end"], iv["offset"]))
    units.sort(key=lambda u: u[3])
    return [u for k, u in enumerate(units) if k % num_processes == process_id]
