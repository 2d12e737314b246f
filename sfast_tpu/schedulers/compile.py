"""Scheduler-step compilation (``trace_scheduler`` knob).

The reference optionally traces ``scheduler.scale_model_input`` and
``scheduler.step`` (``diffusion_pipeline_compiler.py:104-107``) so the
per-step scalar math stays on device.  On TPU this matters far more: an
eager scheduler step would force a host round-trip of the latents every
denoising step.  sfast_tpu schedulers are pure-jnp and jit-able by
construction; this helper wraps their hot methods in the lazy executable
cache.
"""

import logging

from sfast_tpu.runtime.tracing import LazyCompiledFunction

logger = logging.getLogger(__name__)

_HOT_METHODS = ("scale_model_input", "step")


def compile_scheduler(scheduler) -> None:
    """Wrap the scheduler's hot methods in lazy-jit (idempotent)."""
    for meth in _HOT_METHODS:
        fn = getattr(scheduler, meth, None)
        if fn is None or isinstance(fn, LazyCompiledFunction):
            continue
        if getattr(fn, "_sfast_tpu_compiled", False):
            continue
        wrapped = LazyCompiledFunction(
            fn, name=f"scheduler.{meth}", mode="jit"
        )
        wrapped._sfast_tpu_compiled = True
        setattr(scheduler, meth, wrapped)
        logger.info("sfast_tpu: compiled scheduler.%s", meth)
