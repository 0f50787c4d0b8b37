"""Tracing, timing, and per-frame metrics.

The reference's observability is QueryPerformanceCounter wall timers around
scene load / sort / KD build plus a per-frame FPS HUD redrawn with VT escape
codes (``TEST_Dungeonrun/WinMain.cpp:47-48,122-151,219-235``) and
``cuda_profiler_api.h`` included for Nsight traces (``Camera.cu:5-6``).
TPU-native equivalents (SURVEY.md §5):

- `trace(dir)` — context manager around `jax.profiler.trace`; produces an
  XProf/TensorBoard trace of every XLA/Pallas kernel in the region.
- `Timer` — named wall-clock phase timers with a printable report (the
  "Time to Read Tree / sort / partition" block of WinMain.cpp:122-151).
- `FrameMetrics` / `metrics_line` — the per-frame HUD numbers (frame ms,
  FPS, rays/s) as structured data instead of printf.

All timers fence with `jax.block_until_ready` when handed device values, so
a timed region measures real device work, not dispatch.
"""

from __future__ import annotations

import contextlib
import dataclasses
import itertools
import time
from typing import Any

import jax

_UNIQ = itertools.count(1)   # never-repeating perturbation ids (see
                             # device_time: defeats runtime dedup caching)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpu_raytracer_trace"):
    """Profile a region into an XProf/TensorBoard trace directory."""
    with jax.profiler.trace(log_dir):
        yield log_dir


class Timer:
    """Named phase timers: ``with timer.phase("kd build"): ...``."""

    def __init__(self) -> None:
        self.phases: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, fence: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            self.phases[name] = (time.perf_counter() - t0
                                 + self.phases.get(name, 0.0))

    def report(self) -> str:
        width = max((len(k) for k in self.phases), default=0)
        return "\n".join(f"{k:<{width}}  {v * 1e3:10.2f} ms"
                         for k, v in self.phases.items())


@dataclasses.dataclass
class FrameMetrics:
    """Per-frame numbers the reference prints in its HUD
    (WinMain.cpp:226-234)."""

    frame_ms: float
    num_rays: int
    hit_rate: float = float("nan")

    @property
    def fps(self) -> float:
        return 1e3 / self.frame_ms if self.frame_ms > 0 else float("inf")

    @property
    def rays_per_sec(self) -> float:
        return self.num_rays / (self.frame_ms * 1e-3)


def metrics_line(m: FrameMetrics) -> str:
    return (f"{m.frame_ms:8.2f} ms  {m.fps:8.1f} FPS  "
            f"{m.rays_per_sec:.3e} rays/s  hit={m.hit_rate:.3f}")


def timed(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Steady-state seconds per call, device-fenced.

    WARNING (r4): on the tunneled axon runtime this loop pattern —
    repeated identical calls, fenced with block_until_ready — reported
    ~0.05 ms for a 207 ms frame: the runtime services repeated identical
    dispatches from a cache and block_until_ready does not force remote
    execution. Use `device_time` for any number that matters; this
    helper is kept only for CPU-backend tests.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def device_time(make_call, n_lo: int = 4, n_hi: int = 8,
                repeats: int = 3) -> float:
    """TRUE seconds of device compute per call, by the batch-delta method.

    ``make_call(i)`` must RETURN the (lazy) output of one call whose
    traced inputs are perturbed by the integer ``i`` (e.g. ``pos + i *
    1e-12``) so every call is a DISTINCT execution — the tunneled axon
    runtime dedup-caches repeated identical dispatches, and
    block_until_ready does not force remote execution (measured r4:
    0.05 ms reported for a 207 ms frame). This enqueues n distinct calls,
    folds one element of every output into a single scalar, materializes
    it on the host (the only real fence), and returns
    the MEDIAN over ``repeats`` estimates of
    (t(n_hi) - t(n_lo)) / (n_hi - n_lo) — fixed dispatch/transfer
    latency cancels in each delta, and the median suppresses tunnel
    jitter (single deltas measured with +-10-20 ms of noise at
    frame scale).
    """
    import jax.numpy as jnp

    def run(n):
        t0 = time.perf_counter()
        tot = None
        for _ in range(n):
            # process-global counter: indices never repeat, so the
            # runtime's dedup cache can never serve a timed call
            out = make_call(next(_UNIQ))
            leaves = [jnp.ravel(v)[0].astype(jnp.float32)
                      for v in jax.tree.leaves(out)
                      if hasattr(v, "dtype")]
            s = leaves[0]
            for v in leaves[1:]:
                s = s + v
            tot = s if tot is None else tot + s
        _ = float(tot)
        return time.perf_counter() - t0

    _ = run(1)                         # compile + warm
    est = []
    for _ in range(repeats):
        t_lo = run(n_lo)
        t_hi = run(n_hi)
        est.append(max(t_hi - t_lo, 1e-9) / (n_hi - n_lo))
    est.sort()
    return est[len(est) // 2]
