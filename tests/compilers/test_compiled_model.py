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
        raise RuntimeError("XLA compilation failed: mosaic blew up")

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
