"""VAE structural tests (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.autoencoder_kl import (
    TINY_TEST_VAE,
    SD_VAE,
    create_vae,
    init_vae_params,
)


def test_vae_roundtrip_shapes():
    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    img = jax.random.normal(jax.random.key(1), (1, 32, 32, 3), jnp.float32)
    mean, logvar = enc(img)
    # 2 blocks -> one downsample -> /2
    assert mean.shape == (1, 16, 16, 4)
    assert logvar.shape == (1, 16, 16, 4)
    out = dec(mean)
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_vae_shared_params():
    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    assert dec.params is enc.params


def test_vae_decode_jit():
    dec, _ = create_vae(TINY_TEST_VAE, jax.random.key(0))
    fn = jax.jit(dec.apply_fn(CompilationConfig.Default().replace(enable_pallas=False)))
    z = jax.random.normal(jax.random.key(1), (2, 8, 8, 4), jnp.float32)
    out = fn(dec.params, z)
    assert out.shape == (2, 16, 16, 3)


def test_sd_vae_param_count():
    """diffusers SD VAE has 83_653_863 params — structural parity."""
    params = jax.eval_shape(
        lambda k: init_vae_params(k, SD_VAE), jax.random.key(0)
    )
    n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    assert n == 83_653_863, n
