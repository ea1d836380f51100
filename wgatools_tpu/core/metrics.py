"""Per-stage timing/bytes counters and optional device tracing.

The reference has no in-repo tracing (timing was external hyperfine,
SURVEY.md §5); here every tool can record stage wall times and byte
volumes, reported to stderr at -vv, and the WGA_TPU_TRACE=<dir> env var
wraps the run in a jax.profiler trace for TPU timeline inspection.
"""

import contextlib
import logging
import os
import time

log = logging.getLogger("wgatools_tpu.metrics")


class Metrics:
    def __init__(self):
        self.stages = {}  # name -> [seconds, bytes]

    @contextlib.contextmanager
    def stage(self, name: str, nbytes: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            entry = self.stages.setdefault(name, [0.0, 0])
            entry[0] += time.perf_counter() - t0
            entry[1] += nbytes

    def add_bytes(self, name: str, nbytes: int):
        self.stages.setdefault(name, [0.0, 0])[1] += nbytes

    def report(self):
        for name, (secs, nbytes) in self.stages.items():
            rate = f", {nbytes / secs / 1e6:.1f} MB/s" if nbytes and secs else ""
            size = f", {nbytes / 1e6:.1f} MB" if nbytes else ""
            log.debug("stage %-20s %8.3fs%s%s", name, secs, size, rate)


METRICS = Metrics()


@contextlib.contextmanager
def maybe_trace():
    """jax.profiler trace when WGA_TPU_TRACE=<dir> is set."""
    trace_dir = os.environ.get("WGA_TPU_TRACE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    log.info("jax profiler trace written to %s", trace_dir)
