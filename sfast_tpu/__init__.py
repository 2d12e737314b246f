"""sfast_tpu — a TPU-native diffusion inference compiler.

Rebuild of the capabilities of stable-fast (reference:
``src/sfast/__init__.py:18-35``) on top of JAX/XLA/Pallas:

- ``sfast_tpu.compile(pipe, config)`` swaps the heavy submodels of a
  diffusers-style pipeline (UNet / VAE / text encoders / image encoder)
  with lazily-compiled XLA executables, mirroring
  ``sfast.compile`` (reference ``compilers/diffusion_pipeline_compiler.py:81``).
- Per-shape executable caching replaces CUDA-graph capture
  (reference ``cuda/graphs.py:16-51``): one AOT-compiled XLA executable per
  input-signature, with a persistent on-disk compilation cache so cold
  starts stay in the seconds range.
- Hand-written Pallas kernels replace the Triton/CUTLASS kernels
  (flash attention ≙ xformers bridge, fused GroupNorm+SiLU ≙
  ``triton/ops/group_norm.py``, fused GEGLU ≙
  ``csrc/operators/cutlass/cutlass_dual_linear_kernel.cu``).
- Weights stay function *arguments* (never baked constants), so LoRA
  hot-swap needs no recompile — the analog of ``preserve_parameters=True``
  (reference ``diffusion_pipeline_compiler.py:35-39``).
"""

import logging

from sfast_tpu.version import __version__
from sfast_tpu.utils.env import setup_environment

logger = logging.getLogger(__name__)

# Native helper extension (_C): host-side hot-path helpers in C
# (signature hashing / cache index), the analog of the reference's
# `sfast._C` pybind extension (reference csrc/main.cpp:13-24).  Optional:
# everything degrades to pure-Python implementations, mirroring how every
# reference fusion pass is `hasattr`-gated (jit/passes/__init__.py:64).
try:  # pragma: no cover - exercised only when the extension is built
    from sfast_tpu import _C  # type: ignore
except ImportError:  # pragma: no cover
    _C = None
    logger.debug("sfast_tpu._C native extension not built; using Python fallbacks")

setup_environment()

from sfast_tpu.config import CompilationConfig  # noqa: E402
from sfast_tpu.compilers.diffusion_pipeline_compiler import (  # noqa: E402
    compile,
    compile_model,
    compile_unet,
    compile_vae,
)
# Generic function-compilation API — the analog of the reference's dynamo
# backends (`torch.compile(backend=sfast_jit_trace)`,
# dynamo/backends/sfast_jit.py:14-64): wrap any pure function in the
# lazy per-signature executable cache.
from sfast_tpu.runtime.tracing import lazy_jit  # noqa: E402

__all__ = [
    "__version__",
    "CompilationConfig",
    "compile",
    "compile_model",
    "compile_unet",
    "compile_vae",
    "lazy_jit",
]
