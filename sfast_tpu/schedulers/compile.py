"""Scheduler-step compilation (``trace_scheduler`` knob).

The reference optionally traces ``scheduler.scale_model_input`` and
``scheduler.step`` (``diffusion_pipeline_compiler.py:104-107``).  On TPU
this matters far more: an eager scheduler step would round-trip the
latents to host every denoising iteration.  sfast_tpu schedulers are
pure-jnp frozen dataclasses, so compilation wraps them in a delegating
proxy whose hot methods dispatch through the lazy executable cache.
"""

import logging

from sfast_tpu.runtime.tracing import LazyCompiledFunction

logger = logging.getLogger(__name__)

_HOT_METHODS = ("scale_model_input", "step")


class CompiledScheduler:
    """Delegating proxy: hot methods jitted, everything else forwarded."""

    def __init__(self, scheduler):
        self._scheduler = scheduler
        for meth in _HOT_METHODS:
            fn = getattr(scheduler, meth, None)
            if fn is None:
                continue
            wrapped = LazyCompiledFunction(fn, name=f"scheduler.{meth}", mode="jit")
            object.__setattr__(self, meth, wrapped)
            logger.info("sfast_tpu: compiled scheduler.%s", meth)

    def __getattr__(self, name):
        return getattr(self._scheduler, name)


def compile_scheduler(scheduler):
    """Idempotent: returns a CompiledScheduler proxy."""
    if isinstance(scheduler, CompiledScheduler):
        return scheduler
    return CompiledScheduler(scheduler)
