"""End-to-end parity of the JAX CLIP text encoder against a real
transformers CLIPTextModel (random init, converted weights) — the
strongest correctness check available without model downloads.

This is the TPU build's answer to the reference's compare-vs-eager-torch
test strategy (SURVEY.md §4), made assertable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfast_tpu.models.clip_text import clip_text_fwd, CLIPTextConfig
from sfast_tpu.interop.convert_clip import (
    clip_config_from_hf,
    convert_clip_text_params,
)
from sfast_tpu.config import CompilationConfig


@pytest.fixture(scope="module")
def hf_clip():
    import torch
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=1000,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
        eos_token_id=3,
        bos_token_id=1,
        pad_token_id=0,
    )
    model = CLIPTextModel(hf_cfg).eval()
    return model, hf_cfg


def _convert(hf_clip):
    model, hf_cfg = hf_clip
    cfg = clip_config_from_hf(hf_cfg, dtype=jnp.float32)
    params = convert_clip_text_params(model.state_dict(), cfg)
    return cfg, params


def test_clip_last_hidden_state_parity(hf_clip):
    import torch

    model, _ = hf_clip
    cfg, params = _convert(hf_clip)

    ids = np.random.RandomState(0).randint(4, 1000, size=(2, 77)).astype(np.int64)
    ids[:, 0] = 1
    ids[0, 20] = 3  # EOS mid-sequence
    ids[1, 76] = 3

    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).last_hidden_state.numpy()

    out = clip_text_fwd(
        cfg, CompilationConfig.Default(), params, jnp.asarray(ids, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]), ref, rtol=2e-3, atol=2e-3
    )


def test_clip_pooled_output_parity(hf_clip):
    import torch

    model, _ = hf_clip
    cfg, params = _convert(hf_clip)

    ids = np.random.RandomState(1).randint(4, 1000, size=(1, 77)).astype(np.int64)
    ids[0, 30] = 3

    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).pooler_output.numpy()

    out = clip_text_fwd(
        cfg, CompilationConfig.Default(), params, jnp.asarray(ids, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(out["pooler_output"]), ref, rtol=2e-3, atol=2e-3
    )


def test_clip_hidden_states_penultimate(hf_clip):
    """SD2/SDXL condition on hidden_states[-2]."""
    import torch

    model, _ = hf_clip
    cfg, params = _convert(hf_clip)
    ids = np.random.RandomState(2).randint(4, 1000, size=(1, 77)).astype(np.int64)
    ids[0, -1] = 3

    with torch.no_grad():
        ref = model(
            torch.from_numpy(ids), output_hidden_states=True
        ).hidden_states[-2].numpy()

    out = clip_text_fwd(
        cfg,
        CompilationConfig.Default(),
        params,
        jnp.asarray(ids, jnp.int32),
        output_hidden_states=True,
    )
    np.testing.assert_allclose(
        np.asarray(out["hidden_states"][-2]), ref, rtol=2e-3, atol=2e-3
    )
