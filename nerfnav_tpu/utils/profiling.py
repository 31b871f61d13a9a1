"""Lightweight profiling utilities.

Capability parity: the reference's observability is ad-hoc wall-clock /
CUDA-event timing around hot loops (nerf/gui.py:97-132, estimator timing
prints). Here: a scoped timer that blocks on device work, plus optional
jax.profiler trace capture for deep dives (view with TensorBoard or Perfetto).
"""

import contextlib
import time


@contextlib.contextmanager
def device_timer(name: str, out: dict | None = None):
    """Times a block INCLUDING pending device work (block_until_ready on any
    jax arrays the block registers via `out['result']`)."""
    import jax

    t0 = time.perf_counter()
    box = {}
    yield box
    if "result" in box:
        jax.block_until_ready(box["result"])
    dt = time.perf_counter() - t0
    if out is not None:
        out[name] = dt
    print(f"[timer] {name}: {dt * 1e3:.2f} ms")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/nerfnav_trace"):
    """Capture a jax.profiler trace of the block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        print(f"[trace] written to {log_dir}")
