"""Profiling helpers.

Counterparts of the reference's ``profile/auto_profiler.py:5-35``
(cProfile context manager used by benchmark tests) and the CUDA-event
``IterationProfiler`` of the examples
(``examples/optimize_stable_diffusion_pipeline.py:127-151``) — the
reference's README warns that tqdm lies under async CUDA
(``README.md:312-313``); the TPU equivalent of event timing is
``block_until_ready`` around device results.

For deep kernel-level analysis use :func:`trace` (jax.profiler →
TensorBoard/XProf dump), the analog of nsys the reference defers to.
"""

import contextlib
import time
from typing import Optional

import jax


class AutoProfiler:
    """Context manager: wall-time + optional device sync on exit.

    >>> with AutoProfiler("unet step") as p:
    ...     out = model(x)
    ...     p.track(out)   # block_until_ready'd on exit
    """

    def __init__(self, name: str = "", echo=print):
        self.name = name
        self.echo = echo
        self.elapsed: Optional[float] = None
        self._tracked = []

    def track(self, value):
        self._tracked.append(value)
        return value

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        for v in self._tracked:
            jax.block_until_ready(v)
        self.elapsed = time.perf_counter() - self._t0
        if self.echo:
            self.echo(f"[sfast_tpu] {self.name}: {self.elapsed*1e3:.1f} ms")
        return False


class IterationProfiler:
    """Per-iteration device-time profiler for denoising loops.

    Use as a ``callback_on_step_end``; each callback blocks on the step's
    latents, so the recorded deltas are true device step times.
    """

    def __init__(self):
        self.times = []
        self._last = None

    def __call__(self, pipe, i, t, kwargs):
        jax.block_until_ready(kwargs.get("latents"))
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def iterations_per_second(self) -> Optional[float]:
        if not self.times:
            return None
        return len(self.times) / sum(self.times)

    def summary(self) -> str:
        ips = self.iterations_per_second
        return f"{ips:.2f} it/s" if ips else "n/a"


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (open the dump with XProf/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
