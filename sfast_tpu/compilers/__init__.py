from sfast_tpu.compilers.diffusion_pipeline_compiler import (
    compile,
    compile_unet,
    compile_vae,
    compile_model,
    CompiledModel,
)

__all__ = [
    "compile",
    "compile_unet",
    "compile_vae",
    "compile_model",
    "CompiledModel",
]
