"""Device-path gating shared by the tools.

Auto mode must not *initialize* a backend just to probe it (the remote-TPU
client costs seconds to bring up): the device paths engage when
WGA_TPU_DEVICE is set, or when JAX is already live on a TPU backend.
"""

import os
import sys

# auto-device only pays off past this many alignment columns (device
# dispatch + remote compile latency dominates below it)
DEVICE_MIN_COLUMNS = 1 << 22

# same rule for op-table batches (chain_scan / segment-sum pipelines):
# ops are ~32 columns each, so this matches DEVICE_MIN_COLUMNS volume
DEVICE_MIN_OPS = 1 << 16


def device_requested(device=None) -> bool:
    if device is not None:
        return device
    env = os.environ.get("WGA_TPU_DEVICE")
    if env is not None:
        return env not in ("", "0", "false")
    if "jax" not in sys.modules:
        return False
    try:
        import jax
        from jax._src import xla_bridge

        if not xla_bridge.backends_are_initialized():
            return False
        return jax.default_backend() == "tpu"
    except Exception:
        return False
