"""Profiling and roofline accounting.

The reference's only GPU timing is a TimerQuery around the atmosphere pass
(src/Render/Objects/TimerQuery.cs, src/Render/AtmosphericScatterer.cs:65);
frame rate lives in the window title.  Here profiling is first-class:

  * :func:`trace` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable trace directory (op-level device timeline);
  * :func:`frame_stats` — wall-clock timing of a thunk with device sync,
    reporting Mrays/s and the roofline picture for the trace kernel.

Roofline model for the demo-scene trace kernel (per ray segment):
55-primitive linear scan ~ 30 VPU flops each + winner gather + BSDF/RNG
~ 600 flops -> ~2.3 kflop/segment; bytes/ray from HBM ~ 56 B (the scene
lives in SMEM/VMEM; only per-pixel state and outputs stream).  The kernel
is compute-bound on the VPU, which is why Mrays/s (not GB/s) is the
headline metric (BASELINE.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np

FLOPS_PER_SEGMENT_DEMO = 2300.0   # see module docstring
HBM_BYTES_PER_PIXEL = 56.0        # radiance(12) + miss dir/thr(24) + counts/seed(8) + px/py(8) + accum rmw(4)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpt_profile"):
    """jax.profiler trace around a block: ``with profiling.trace(): run()``.
    View with TensorBoard's profile plugin or xprof."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def frame_stats(thunk: Callable[[], object], rays: int, pixels: int,
                n: int = 5, flops_per_segment: float = FLOPS_PER_SEGMENT_DEMO):
    """Time ``thunk`` (must return a jax value; fetching syncs) and report
    throughput + roofline utilization estimates.

    Returns a dict: ms/frame, mrays_per_s, est_vpu_gflops, hbm_gb_per_s.
    """
    import jax
    jax.block_until_ready(thunk())
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(thunk())
        ts.append(time.time() - t0)
    sec = float(np.median(ts))
    return {
        "ms_per_frame": round(sec * 1e3, 3),
        "mrays_per_s": round(rays / sec / 1e6, 2),
        "est_vpu_gflops": round(rays * flops_per_segment / sec / 1e9, 1),
        "hbm_gb_per_s": round(pixels * HBM_BYTES_PER_PIXEL / sec / 1e9, 2),
    }
