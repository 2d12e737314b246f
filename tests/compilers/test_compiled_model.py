"""CompiledModel / compile() API tests (≙ reference
tests/compilers/test_stable_diffusion_pipeline_compiler.py structure,
but assertable and CPU-runnable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.module import Model
from sfast_tpu.compilers.diffusion_pipeline_compiler import (
    compile,
    compile_model,
    CompiledModel,
)


def _toy_model(scale=1.0):
    def forward(config, ccfg, params, x):
        return x @ params["w"] + params["b"]

    params = {
        "w": jnp.eye(4) * scale,
        "b": jnp.zeros((4,)),
    }
    return Model(config={}, params=params, forward=forward, name="toy")


def test_compile_model_basic():
    m = compile_model(_toy_model())
    x = jnp.ones((2, 4))
    np.testing.assert_allclose(np.asarray(m(x)), np.ones((2, 4)))
    assert m.cache_size == 1


def test_hot_swap_no_recompile():
    m = compile_model(_toy_model())
    x = jnp.ones((2, 4))
    m(x)
    assert m.cache_size == 1
    m.update_params({"w": 3 * jnp.eye(4), "b": jnp.zeros((4,))})
    np.testing.assert_allclose(np.asarray(m(x)), 3 * np.ones((2, 4)))
    assert m.cache_size == 1  # LoRA-swap invariant: zero recompiles


def test_hot_swap_releases_old_params():
    """update_params must not leave the OLD tree reachable through the
    wrapped model bundle: for a quantized SDXL UNet the stale reference
    pinned the 5.1 GB bf16 PackedParams buffer next to its int8
    replacement (OOM on a 16 GB v5e, 2026-08-19)."""
    import weakref

    m = compile_model(_toy_model())
    old_w = m.params["w"]
    ref = weakref.ref(old_w)
    # same-structure swap
    m.update_params({"w": 3 * jnp.eye(4), "b": jnp.zeros((4,))})
    assert m.model.params["w"] is m.params["w"]
    # restructure swap (the quantization path)
    m.update_params(
        {"w_q": jnp.eye(4, dtype=jnp.int8), "b": jnp.zeros((4,))},
        allow_restructure=True,
    )
    assert m.model.params is m.params
    del old_w
    import gc

    gc.collect()
    assert ref() is None, "old param array still reachable after swap"


def test_hot_swap_structure_mismatch_raises():
    m = compile_model(_toy_model())
    with pytest.raises(ValueError):
        m.update_params({"w": jnp.eye(4)})  # missing 'b'


def test_freeze_blocks_hot_swap():
    cfg = CompilationConfig.Default().replace(freeze=True)
    m = compile_model(_toy_model(), cfg)
    x = jnp.ones((1, 4))
    np.testing.assert_allclose(np.asarray(m(x)), np.ones((1, 4)))
    with pytest.raises(RuntimeError):
        m.update_params({"w": jnp.eye(4), "b": jnp.zeros((4,))})


def test_compile_pipeline_duck_typing():
    class Pipe:
        pass

    pipe = Pipe()
    pipe.unet = _toy_model()
    pipe.vae = _toy_model(scale=2.0)
    pipe.text_encoder = None

    out = compile(pipe)
    assert isinstance(out.unet, CompiledModel)
    assert isinstance(out.vae, CompiledModel)
    x = jnp.ones((1, 4))
    np.testing.assert_allclose(np.asarray(out.vae(x)), 2 * np.ones((1, 4)))


def test_compile_idempotent():
    class Pipe:
        pass

    pipe = Pipe()
    pipe.unet = _toy_model()
    compile(pipe)
    first = pipe.unet
    compile(pipe)
    assert pipe.unet is first


def test_compile_failure_falls_back_to_eager(monkeypatch, caplog):
    """≙ reference module_jit_hook 'cannot_compile' sentinel: a compiler
    failure degrades to eager execution permanently instead of raising."""
    import logging

    m = compile_model(_toy_model())
    x = jnp.ones((2, 4))

    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError("XLA compilation failed: mosaic blew up")

    monkeypatch.setattr(m, "_call", boom)
    with caplog.at_level(logging.WARNING):
        out = m(x)
    np.testing.assert_allclose(np.asarray(out), np.ones((2, 4)))
    assert m._cannot_compile
    # second call goes straight to eager (no more attempts)
    m(x)
    assert calls["n"] == 1


def test_user_errors_still_raise(monkeypatch):
    m = compile_model(_toy_model())

    def user_err(*a, **k):
        raise ValueError("shapes do not match for dot_general")

    monkeypatch.setattr(m, "_call", user_err)
    with pytest.raises(ValueError):
        m(jnp.ones((2, 4)))


def test_user_error_mentioning_xla_still_raises(monkeypatch):
    """Classification is by exception TYPE: a user shape error whose
    message happens to contain 'XLA' must NOT silently degrade the model
    to eager (the old substring matcher did)."""
    m = compile_model(_toy_model())

    def user_err(*a, **k):
        raise TypeError("dot_general requires ... (while lowering to XLA HLO)")

    monkeypatch.setattr(m, "_call", user_err)
    with pytest.raises(TypeError):
        m(jnp.ones((2, 4)))
    assert not m._cannot_compile


def test_real_shape_error_raises_through_compiled_model():
    """No monkeypatching: a genuinely wrong input shape surfaces as an
    exception instead of flipping the model to eager."""
    m = compile_model(_toy_model())
    with pytest.raises(Exception):
        m(jnp.ones((2, 5)))  # 5 != 4 — dot_general mismatch at trace time
    assert not m._cannot_compile


def test_enable_jit_false_runs_eagerly():
    cfg = CompilationConfig.Default().replace(enable_jit=False)
    m = compile_model(_toy_model(), cfg)
    x = jnp.ones((2, 4))
    np.testing.assert_allclose(np.asarray(m(x)), np.ones((2, 4)))
    assert m.cache_size == 0  # nothing compiled
    m.warmup(x)
    assert m.cache_size == 0


def test_preserve_parameters_false_is_freeze():
    cfg = CompilationConfig.Default().replace(preserve_parameters=False)
    m = compile_model(_toy_model(), cfg)
    x = jnp.ones((1, 4))
    np.testing.assert_allclose(np.asarray(m(x)), np.ones((1, 4)))
    with pytest.raises(RuntimeError):
        m.update_params({"w": jnp.eye(4), "b": jnp.zeros((4,))})


def test_prefer_lowp_gemm_false_still_correct():
    cfg = CompilationConfig.Default().replace(prefer_lowp_gemm=False)
    m = compile_model(_toy_model(scale=2.0), cfg)
    x = jnp.ones((2, 4))
    np.testing.assert_allclose(np.asarray(m(x)), 2 * np.ones((2, 4)))


def test_memory_format_nchw_boundary_transpose():
    """memory_format='NCHW' transposes 4-D inputs/outputs at the model
    boundary so torch-layout callers keep their layout."""

    def forward(config, ccfg, params, x):
        # model is natively NHWC: scale channel 0 only (last axis)
        return x * params["cscale"]

    params = {"cscale": jnp.asarray([2.0, 1.0, 1.0, 1.0])}
    model = Model(config={}, params=params, forward=forward, name="t")
    x_nchw = jnp.stack(
        [jnp.full((5, 6), 1.0), jnp.full((5, 6), 3.0),
         jnp.full((5, 6), 4.0), jnp.full((5, 6), 5.0)]
    )[None]  # (1, 4, 5, 6) channel-first
    m = compile_model(
        model, CompilationConfig.Default().replace(memory_format="NCHW")
    )
    out = np.asarray(m(x_nchw))
    assert out.shape == (1, 4, 5, 6)  # layout preserved for the caller
    np.testing.assert_allclose(out[0, 0], 2.0)  # channel 0 doubled
    np.testing.assert_allclose(out[0, 1], 3.0)

    m_nhwc = compile_model(model)
    out2 = np.asarray(m_nhwc(jnp.transpose(x_nchw, (0, 2, 3, 1))))
    np.testing.assert_allclose(out, np.transpose(out2, (0, 3, 1, 2)))


def test_memory_format_invalid_raises():
    with pytest.raises(ValueError):
        compile_model(
            _toy_model(),
            CompilationConfig.Default().replace(memory_format="NCWH"),
        )
