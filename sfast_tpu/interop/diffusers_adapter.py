"""Torch diffusers pipeline → sfast_tpu native pipeline.

The top of the interop stack: ``sfast_tpu.compile(torch_pipe)`` lands
here when the pipeline's submodels are torch modules.  Weights are
extracted ONCE into jnp pytrees (SURVEY.md §7 design mapping row 1);
forwards are the JAX model mirrors; the returned object is a native
sfast_tpu pipeline whose submodels then get compiled as usual.

Duck-typing mirrors the reference's hasattr probing
(``diffusion_pipeline_compiler.py:88-124``): unet/controlnet/vae/
text_encoder/text_encoder_2/image_encoder/scheduler/tokenizer slots.
"""

import logging

import jax.numpy as jnp

from sfast_tpu.config import CompilationConfig

logger = logging.getLogger(__name__)


def _dtype_of(config: CompilationConfig):
    return jnp.dtype(config.param_dtype)


def convert_unet(torch_unet, dtype):
    from sfast_tpu.interop.convert_unet import (
        convert_unet_params,
        unet_config_from_diffusers,
    )
    from sfast_tpu.models.unet_2d_condition import create_unet

    cfg = unet_config_from_diffusers(dict(torch_unet.config), dtype)
    params = convert_unet_params(torch_unet.state_dict(), cfg)
    from sfast_tpu.models.layers import device_put_tree

    return create_unet(cfg, params=device_put_tree(params))


def convert_svd_unet(torch_unet, dtype):
    from sfast_tpu.interop.convert_svd import (
        convert_svd_unet_params,
        svd_config_from_diffusers,
    )
    from sfast_tpu.models.unet_spatio_temporal import create_svd_unet
    from sfast_tpu.models.layers import device_put_tree

    cfg = svd_config_from_diffusers(dict(torch_unet.config), dtype)
    params = convert_svd_unet_params(torch_unet.state_dict(), cfg)
    return create_svd_unet(cfg, params=device_put_tree(params))


def convert_vae(torch_vae, dtype):
    from sfast_tpu.interop.convert_vae import (
        convert_temporal_vae_params,
        convert_vae_params,
        temporal_vae_config_from_diffusers,
        vae_config_from_diffusers,
    )
    from sfast_tpu.models.autoencoder_kl import create_vae
    from sfast_tpu.models.autoencoder_kl_temporal import create_temporal_vae
    from sfast_tpu.models.layers import device_put_tree

    sd = torch_vae.state_dict()
    # SVD ships AutoencoderKLTemporalDecoder: no post_quant_conv, decoder
    # with spatio-temporal resnets + time_conv_out
    if (
        type(torch_vae).__name__ == "AutoencoderKLTemporalDecoder"
        or "decoder.time_conv_out.weight" in sd
    ):
        tcfg = temporal_vae_config_from_diffusers(dict(torch_vae.config), dtype)
        params = convert_temporal_vae_params(sd, tcfg)
        return create_temporal_vae(tcfg, params=device_put_tree(params))
    cfg = vae_config_from_diffusers(dict(torch_vae.config), dtype)
    params = convert_vae_params(sd, cfg)
    return create_vae(cfg, params=device_put_tree(params))


def convert_text_encoder(torch_te, dtype):
    from sfast_tpu.interop.convert_clip import (
        clip_config_from_hf,
        convert_clip_text_params,
    )
    from sfast_tpu.models.clip_text import create_text_encoder
    from sfast_tpu.models.layers import device_put_tree

    cfg = clip_config_from_hf(torch_te.config, dtype)
    params = convert_clip_text_params(torch_te.state_dict(), cfg)
    return create_text_encoder(cfg, params=device_put_tree(params))


def convert_image_encoder(torch_enc, dtype):
    from sfast_tpu.interop.convert_clip import (
        clip_vision_config_from_hf,
        convert_clip_vision_params,
    )
    from sfast_tpu.models.clip_vision import create_image_encoder
    from sfast_tpu.models.layers import device_put_tree

    hf_cfg = getattr(torch_enc.config, "vision_config", torch_enc.config)
    cfg = clip_vision_config_from_hf(hf_cfg, dtype)
    params = convert_clip_vision_params(torch_enc.state_dict(), cfg)
    return create_image_encoder(cfg, params=device_put_tree(params))


def convert_controlnet(torch_cn, dtype):
    # ControlNet converter: UNet-down-side naming + controlnet extras
    from sfast_tpu.interop.convert_unet import (
        _conv,
        _resnet,
        _spatial_transformer,
        _time_embedding,
        unet_config_from_diffusers,
    )
    from sfast_tpu.models.controlnet import ControlNetConfig, create_controlnet
    from sfast_tpu.models.layers import device_put_tree

    raw = dict(torch_cn.config)
    ucfg = unet_config_from_diffusers(
        {**raw, "up_block_types": ("UpBlock2D",) * len(raw["block_out_channels"]),
         "out_channels": raw.get("in_channels", 4)},
        dtype,
    )
    cfg = ControlNetConfig(
        unet=ucfg,
        conditioning_channels=raw.get("conditioning_channels", 3),
        conditioning_embedding_out_channels=tuple(
            raw.get("conditioning_embedding_out_channels", (16, 32, 96, 256))
        ),
    )
    sd = torch_cn.state_dict()
    n = len(ucfg.block_out_channels)
    p = {
        "conv_in": _conv(sd, "conv_in", dtype),
        "time_embedding": _time_embedding(sd, "time_embedding.", dtype),
    }
    if "add_embedding.linear_1.weight" in sd:
        p["add_embedding"] = _time_embedding(sd, "add_embedding.", dtype)
    down = []
    for i, btype in enumerate(ucfg.down_block_types):
        pre = f"down_blocks.{i}."
        blk = {
            "resnets": [
                _resnet(sd, f"{pre}resnets.{j}.", dtype)
                for j in range(ucfg.layers_per_block)
            ]
        }
        if btype == "CrossAttnDownBlock2D":
            blk["attentions"] = [
                _spatial_transformer(
                    sd, f"{pre}attentions.{j}.",
                    ucfg.transformer_layers_per_block[i],
                    ucfg.use_linear_projection, dtype,
                )
                for j in range(ucfg.layers_per_block)
            ]
        if f"{pre}downsamplers.0.conv.weight" in sd:
            blk["downsample"] = {"conv": _conv(sd, f"{pre}downsamplers.0.conv", dtype)}
        down.append(blk)
    p["down_blocks"] = down
    p["mid_block"] = {
        "resnets": [_resnet(sd, f"mid_block.resnets.{j}.", dtype) for j in range(2)],
        "attentions": [
            _spatial_transformer(
                sd, "mid_block.attentions.0.",
                ucfg.transformer_layers_per_block[-1],
                ucfg.use_linear_projection, dtype,
            )
        ],
    }
    ce = {
        "conv_in": _conv(sd, "controlnet_cond_embedding.conv_in", dtype),
        "blocks": [],
        "conv_out": _conv(sd, "controlnet_cond_embedding.conv_out", dtype),
    }
    i = 0
    while f"controlnet_cond_embedding.blocks.{i}.weight" in sd:
        ce["blocks"].append(_conv(sd, f"controlnet_cond_embedding.blocks.{i}", dtype))
        i += 1
    p["controlnet_cond_embedding"] = ce
    p["controlnet_down_blocks"] = []
    i = 0
    while f"controlnet_down_blocks.{i}.weight" in sd:
        p["controlnet_down_blocks"].append(_conv(sd, f"controlnet_down_blocks.{i}", dtype))
        i += 1
    p["controlnet_mid_block"] = _conv(sd, "controlnet_mid_block", dtype)
    return create_controlnet(cfg, params=device_put_tree(p))


def convert_pipeline(torch_pipe, config: CompilationConfig):
    """Build a native sfast_tpu pipeline from a torch diffusers pipeline."""
    dtype = _dtype_of(config)
    cls_name = type(torch_pipe).__name__

    unet = torch_pipe.unet
    is_svd = "SpatioTemporal" in type(unet).__name__ or "Video" in cls_name

    vae_dec, vae_enc = convert_vae(torch_pipe.vae, dtype)

    if is_svd:
        from sfast_tpu.pipelines.stable_video_diffusion import (
            StableVideoDiffusionPipeline,
        )

        pipe = StableVideoDiffusionPipeline(
            unet=convert_svd_unet(unet, dtype),
            vae=vae_dec,
            vae_encode=vae_enc,
            image_encoder=convert_image_encoder(torch_pipe.image_encoder, dtype),
            dtype=dtype,
        )
        return pipe

    text_encoder = convert_text_encoder(torch_pipe.text_encoder, dtype)
    scheduler = _convert_scheduler(getattr(torch_pipe, "scheduler", None))
    kwargs = dict(
        unet=convert_unet(unet, dtype),
        vae=vae_dec,
        vae_encode=vae_enc,
        text_encoder=text_encoder,
        scheduler=scheduler,
        tokenizer=getattr(torch_pipe, "tokenizer", None),
        dtype=dtype,
    )
    if getattr(torch_pipe, "text_encoder_2", None) is not None:
        from sfast_tpu.pipelines.stable_diffusion_xl import StableDiffusionXLPipeline

        return StableDiffusionXLPipeline(
            text_encoder_2=convert_text_encoder(torch_pipe.text_encoder_2, dtype),
            tokenizer_2=getattr(torch_pipe, "tokenizer_2", None),
            **kwargs,
        )
    from sfast_tpu.pipelines.stable_diffusion import StableDiffusionPipeline

    if getattr(torch_pipe, "controlnet", None) is not None:
        kwargs["controlnet"] = convert_controlnet(torch_pipe.controlnet, dtype)
    pipe = StableDiffusionPipeline(**kwargs)
    # SD2.x conditions on the penultimate hidden state
    if getattr(torch_pipe.text_encoder.config, "num_hidden_layers", 12) == 23:
        pipe.clip_skip_mode = "penultimate"
    return pipe


def _convert_scheduler(torch_scheduler):
    """Map a diffusers scheduler instance to the sfast_tpu equivalent."""
    from sfast_tpu.schedulers import (
        DDIMScheduler,
        DPMSolverMultistepScheduler,
        EulerAncestralDiscreteScheduler,
        EulerDiscreteScheduler,
        LCMScheduler,
        SchedulerConfig,
    )

    if torch_scheduler is None:
        return DPMSolverMultistepScheduler()
    name = type(torch_scheduler).__name__
    raw = dict(torch_scheduler.config)
    cfg = SchedulerConfig(
        num_train_timesteps=raw.get("num_train_timesteps", 1000),
        beta_start=raw.get("beta_start", 0.00085),
        beta_end=raw.get("beta_end", 0.012),
        beta_schedule=raw.get("beta_schedule", "scaled_linear"),
        prediction_type=raw.get("prediction_type", "epsilon"),
        timestep_spacing=raw.get("timestep_spacing", "leading"),
        steps_offset=raw.get("steps_offset", 1),
        use_karras_sigmas=raw.get("use_karras_sigmas", False) or False,
    )
    if "DPMSolver" in name:
        return DPMSolverMultistepScheduler(config=cfg)
    if "EulerAncestral" in name:
        return EulerAncestralDiscreteScheduler(config=cfg)
    if "Euler" in name:
        return EulerDiscreteScheduler(config=cfg)
    if "LCM" in name:
        return LCMScheduler(config=cfg)
    if "DDIM" in name:
        return DDIMScheduler(config=cfg)
    logger.warning(
        "unknown scheduler %s; defaulting to DPMSolverMultistep", name
    )
    return DPMSolverMultistepScheduler(config=cfg)
