from sfast_tpu.pipelines.stable_diffusion import StableDiffusionPipeline

__all__ = ["StableDiffusionPipeline"]
