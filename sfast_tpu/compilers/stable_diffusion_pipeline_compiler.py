"""Deprecated alias of :mod:`diffusion_pipeline_compiler` — API parity
with the reference's back-compat module
(``compilers/stable_diffusion_pipeline_compiler.py:1-8``)."""

import warnings

from sfast_tpu.config import CompilationConfig  # noqa: F401
from sfast_tpu.compilers.diffusion_pipeline_compiler import (  # noqa: F401
    CompiledModel,
    compile,
    compile_model,
    compile_unet,
    compile_vae,
)

warnings.warn(
    "sfast_tpu.compilers.stable_diffusion_pipeline_compiler is deprecated; "
    "use sfast_tpu.compilers.diffusion_pipeline_compiler",
    DeprecationWarning,
    stacklevel=2,
)
