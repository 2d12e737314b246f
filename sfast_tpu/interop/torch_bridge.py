"""torch ⇄ jax tensor bridging.

The reference stays inside torch; sfast_tpu extracts weights from torch
modules *once* at compile time (SURVEY.md §7 design mapping row 1) and
runs pure JAX afterwards, so the bridge only needs host-side conversion,
not a zero-copy device path.
"""

import numpy as np
import jax.numpy as jnp


def torch_to_jnp(t, dtype=None):
    """Convert a torch tensor to a jnp array (host roundtrip).

    bf16/f16 torch tensors go through f32 numpy (numpy has no bf16).
    """
    import torch

    if t.dtype in (torch.bfloat16, torch.float16):
        arr = t.detach().to(torch.float32).cpu().numpy()
        return jnp.asarray(arr, dtype or jnp.bfloat16)
    arr = t.detach().cpu().numpy()
    return jnp.asarray(arr, dtype)


def jnp_to_torch(x):
    import torch

    if x.dtype == jnp.bfloat16:
        return torch.from_numpy(np.asarray(x, np.float32)).to(torch.bfloat16)
    return torch.from_numpy(np.asarray(x))


def linear_w(sd: dict, key: str, dtype=None):
    """torch Linear weight (out, in) → (in, out)."""
    return torch_to_jnp(sd[key].T.contiguous(), dtype)


def conv_w(sd: dict, key: str, dtype=None):
    """torch Conv2d weight OIHW → HWIO."""
    return torch_to_jnp(sd[key].permute(2, 3, 1, 0).contiguous(), dtype)


def vec(sd: dict, key: str, dtype=None):
    return torch_to_jnp(sd[key], dtype)
