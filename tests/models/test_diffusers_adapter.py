"""End-to-end test of sfast_tpu.compile on a (fake) torch diffusers
pipeline: torch modules exposing diffusers' .config/.state_dict() API,
with state dicts produced by our exporters and a REAL transformers
CLIPTextModel — exercising the conversion path without diffusers."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sfast_tpu
from sfast_tpu.config import CompilationConfig
from sfast_tpu.interop.export_unet import export_unet_state_dict
from sfast_tpu.interop.export_vae import export_vae_state_dict
from sfast_tpu.interop.convert_vae import convert_vae_params
from sfast_tpu.models.unet_2d_condition import TINY_UNET, init_unet_params
from sfast_tpu.models.autoencoder_kl import TINY_TEST_VAE, init_vae_params

CCFG = CompilationConfig.Default().replace(
    enable_pallas=False, param_dtype="float32", compute_dtype="float32"
)


class FakeTorchModule:
    def __init__(self, config: dict, state_dict: dict):
        self.config = config
        self._sd = state_dict

    def state_dict(self):
        return self._sd

    def named_parameters(self):  # duck-typing marker used by compile()
        return iter(self._sd.items())


@pytest.fixture(scope="module")
def fake_pipe():
    import torch
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    ucfg = dataclasses.replace(TINY_UNET, cross_attention_dim=64)
    unet_params = init_unet_params(0, ucfg)
    unet_sd = export_unet_state_dict(unet_params, ucfg)
    unet = FakeTorchModule(
        dict(
            sample_size=16,
            in_channels=4,
            out_channels=4,
            block_out_channels=[32, 64],
            down_block_types=list(ucfg.down_block_types),
            up_block_types=list(ucfg.up_block_types),
            layers_per_block=1,
            transformer_layers_per_block=1,
            attention_head_dim=4,
            cross_attention_dim=64,
            norm_num_groups=8,
        ),
        unet_sd,
    )

    vae_params = init_vae_params(1, TINY_TEST_VAE)
    vae_sd = export_vae_state_dict(vae_params, TINY_TEST_VAE)
    vae = FakeTorchModule(
        dict(
            block_out_channels=[16, 32],
            layers_per_block=1,
            norm_num_groups=8,
            latent_channels=4,
            scaling_factor=0.18215,
        ),
        vae_sd,
    )

    torch.manual_seed(0)
    te = CLIPTextModel(
        HFConfig(
            vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=77, hidden_act="quick_gelu",
            eos_token_id=3, bos_token_id=1, pad_token_id=0,
        )
    ).eval()

    class FakeScheduler:
        class _Cfg(dict):
            pass

        config = dict(
            num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
            beta_schedule="scaled_linear", prediction_type="epsilon",
            timestep_spacing="leading", steps_offset=1,
        )

    FakeScheduler.__name__ = "DDIMScheduler"

    class FakePipe:
        pass

    pipe = FakePipe()
    pipe.unet = unet
    pipe.vae = vae
    pipe.text_encoder = te
    pipe.scheduler = FakeScheduler()
    pipe.tokenizer = None
    return pipe


def test_compile_converts_torch_pipeline(fake_pipe):
    native = sfast_tpu.compile(fake_pipe, CCFG)
    from sfast_tpu.pipelines.stable_diffusion import StableDiffusionPipeline

    assert isinstance(native, StableDiffusionPipeline)
    out = native(
        prompt_ids=jnp.ones((1, 77), jnp.int32),
        height=32, width=32, num_inference_steps=2, seed=0,
    )
    assert out.images.shape == (1, 32, 32, 3)
    assert out.images.dtype == np.uint8


def test_converted_scheduler_kind(fake_pipe):
    native = sfast_tpu.compile(fake_pipe, CCFG)
    # DDIM name → DDIMScheduler mapping (possibly wrapped by trace_scheduler)
    sch = native.scheduler
    inner = getattr(sch, "_scheduler", sch)
    assert type(inner).__name__ == "DDIMScheduler"
