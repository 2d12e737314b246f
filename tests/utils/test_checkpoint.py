import jax
import jax.numpy as jnp
import numpy as np

from sfast_tpu.utils.checkpoint import load_params, save_params
from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet


def test_roundtrip_mixed_tree(tmp_path):
    tree = {
        "a": jnp.ones((2, 3), jnp.bfloat16),
        "b": [jnp.zeros((4,), jnp.float32), {"c": jnp.arange(3)}],
    }
    p = str(tmp_path / "ckpt.npz")
    save_params(p, tree)
    back = load_params(p, device_put=False)
    assert back["a"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(back["a"], np.float32), np.ones((2, 3), np.float32)
    )
    np.testing.assert_array_equal(np.asarray(back["b"][1]["c"]), np.arange(3))


def test_unet_params_roundtrip(tmp_path):
    unet = create_unet(TINY_UNET, jax.random.key(0))
    p = str(tmp_path / "unet.npz")
    save_params(p, unet.params)
    back = load_params(p, device_put=False)
    a = jax.tree_util.tree_leaves(unet.params)
    b = jax.tree_util.tree_leaves(back)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(
            np.asarray(x, np.float32), np.asarray(y, np.float32)
        )
