"""TPU device probing (≙ reference ``utils/gpu_device.py:4-15``
``device_has_tensor_core``/``device_has_capability`` feeding config
defaults)."""

from typing import Optional

import jax


def default_device():
    return jax.devices()[0]


def device_kind() -> str:
    """e.g. 'TPU v5 lite' / 'TPU v4' / 'cpu'."""
    return getattr(default_device(), "device_kind", "cpu")


def is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def device_has_mxu() -> bool:
    """Every TPU generation sfast_tpu targets has a matrix unit — the
    analog of the reference's tensor-core probe (SM >= 7.0)."""
    return is_tpu()


def hbm_bytes() -> Optional[int]:
    stats = getattr(default_device(), "memory_stats", lambda: None)() or {}
    return stats.get("bytes_limit")


def supports_int8_matmul() -> bool:
    """v5e+ run int8 at 2x bf16 rate on the MXU (the analog of the
    reference gating CUTLASS int8 on SM80, cutlass_qlinear.cc)."""
    return is_tpu()
