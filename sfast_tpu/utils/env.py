"""Environment setup for sfast_tpu.

TPU-native analog of the reference's ``utils/env.py:96-115``
(``setup_environment`` honoring ``SFAST_ENV_MODULE``).  On TPU the
environment knobs that matter are XLA/JAX flags rather than cuDNN/OpenCV
guards:

- enables JAX's persistent compilation cache (the feature the reference
  lacks and pays warmup for every process — SURVEY.md §5 checkpoint/resume),
- honors ``SFAST_TPU_ENV_MODULE`` for user hooks, mirroring
  ``SFAST_ENV_MODULE`` (reference ``utils/env.py:109-115``).
"""

import importlib
import logging
import os

logger = logging.getLogger(__name__)

_SETUP_DONE = False

# Default on-disk compilation cache location; override with
# SFAST_TPU_CACHE_DIR, or disable with SFAST_TPU_DISABLE_CACHE=1.
DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/sfast_tpu/xla_cache")


def enable_persistent_compilation_cache(cache_dir=None):
    """Turn on JAX's persistent compilation cache.

    This is the load-bearing piece of the <10s cold-compile target
    (BASELINE.md): lowered executables are serialized to disk keyed by HLO
    fingerprint, so the second process start skips XLA compilation
    entirely.  The reference's equivalent gap is documented at
    SURVEY.md §5 ("every process pays warmup again").
    """
    import jax

    cache_dir = cache_dir or os.environ.get("SFAST_TPU_CACHE_DIR", DEFAULT_CACHE_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything, not just slow compiles: dispatch of a cached
        # executable is our steady-state path (≙ cudaGraphLaunch).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # also persist XLA-internal caches (autotune results etc.) so the
        # warm start skips re-autotuning, not just re-lowering
        try:
            jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
        except Exception:
            pass
    except Exception as e:  # pragma: no cover - config names vary by jax version
        logger.warning("could not enable persistent compilation cache: %s", e)
    return cache_dir


def setup_environment():
    """Idempotent process-level setup, called from ``sfast_tpu.__init__``."""
    global _SETUP_DONE
    if _SETUP_DONE:
        return
    _SETUP_DONE = True

    # Persistent cache only for TPU targets: CPU executables are AOT'd
    # against host CPU features and don't transport across machines.
    # (Platform is read from jax.config/env to avoid initializing a
    # backend at import time; the axon plugin platform is a tunneled TPU.)
    try:
        import jax

        platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    except Exception:  # pragma: no cover
        platforms = os.environ.get("JAX_PLATFORMS", "")
    is_tpu = ("tpu" in platforms) or ("axon" in platforms) or platforms == ""
    if os.environ.get("SFAST_TPU_DISABLE_CACHE", "0") != "1" and is_tpu:
        enable_persistent_compilation_cache()

    env_module = os.environ.get("SFAST_TPU_ENV_MODULE")
    if env_module:
        try:
            mod = importlib.import_module(env_module)
            if hasattr(mod, "setup_environment"):
                mod.setup_environment()
        except Exception:
            logger.exception("SFAST_TPU_ENV_MODULE=%s failed", env_module)


def seed_all_rng(seed):
    """Seed host-side RNGs (reference ``utils/env.py:26-44``).

    JAX's own randomness is explicit (``jax.random.key``) and needs no
    global seeding; this covers numpy / python / torch-if-present for test
    reproducibility.
    """
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed % (2**32))
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass
