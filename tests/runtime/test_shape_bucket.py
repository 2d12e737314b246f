import jax.numpy as jnp
import numpy as np

from sfast_tpu.runtime.shape_bucket import bucket_size, pad_batch, unpad_batch


def test_bucket_size():
    assert bucket_size(1) == 1
    assert bucket_size(3) == 4
    assert bucket_size(8) == 8
    assert bucket_size(33) == 64  # beyond top bucket: next multiple of 32
    assert bucket_size(5, buckets=(2, 6)) == 6


def test_pad_unpad_roundtrip():
    x = jnp.arange(3 * 4, dtype=jnp.float32).reshape(3, 4)
    padded, n = pad_batch(x)
    assert padded.shape == (4, 4)
    assert n == 3
    out = unpad_batch(padded, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_exact_bucket_no_copy():
    x = jnp.ones((4, 2))
    padded, n = pad_batch(x)
    assert padded is x and n == 4
