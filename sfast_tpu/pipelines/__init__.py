from sfast_tpu.pipelines.stable_diffusion import StableDiffusionPipeline
from sfast_tpu.pipelines.stable_diffusion_xl import StableDiffusionXLPipeline
from sfast_tpu.pipelines.stable_video_diffusion import (
    StableVideoDiffusionPipeline,
)

__all__ = [
    "StableDiffusionPipeline",
    "StableDiffusionXLPipeline",
    "StableVideoDiffusionPipeline",
]
