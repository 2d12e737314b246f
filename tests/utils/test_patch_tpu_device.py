import jax.numpy as jnp
import numpy as np

from sfast_tpu.utils.patch import patch_params
from sfast_tpu.utils.tpu_device import device_kind, hbm_bytes, is_tpu


def test_patch_params_replaces_matching_subtrees():
    tree = {
        "attn": {"to_q": {"w": jnp.ones((2, 2))}},
        "conv": {"w": jnp.zeros((1,))},
    }
    out = patch_params(
        tree,
        lambda path, node: path and path[-1] == "to_q",
        lambda path, node: {"w": node["w"] * 3},
    )
    np.testing.assert_array_equal(np.asarray(out["attn"]["to_q"]["w"]), 3)
    np.testing.assert_array_equal(np.asarray(out["conv"]["w"]), 0)
    # original untouched
    np.testing.assert_array_equal(np.asarray(tree["attn"]["to_q"]["w"]), 1)


def test_patch_params_lists():
    tree = {"blocks": [{"x": jnp.ones(())}, {"x": jnp.ones(())}]}
    out = patch_params(
        tree,
        lambda path, node: path and path[-1] == "x",
        lambda path, node: node + 1,
    )
    assert float(out["blocks"][1]["x"]) == 2


def test_tpu_device_probes_on_cpu():
    assert not is_tpu()
    assert isinstance(device_kind(), str)
    hbm_bytes()  # must not raise
