"""Attention dispatch — the ``sfast_xformers::memory_efficient_attention``
analog (reference ``libs/xformers/xformers_attention.py:51-63``).

Two backends:

- ``flash``: the Pallas blockwise kernel (``flash_attention.py``) — O(S)
  memory, the default on TPU for long sequences;
- ``xla``: plain ``softmax(q·kᵀ)·v`` in jnp — XLA fuses this well for
  short sequences (cross-attention kv=77, CLIP seq=77) where flash block
  machinery is pure overhead.

The dispatcher picks per-shape, mirroring how the reference routes small
cases to aten and big ones to xformers/Triton
(``triton/torch_ops.py:258-296`` fallback discipline).
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp

from sfast_tpu.ops.flash_attention import flash_attention, flash_attention_int8

# Below this q-length the XLA path wins (score matrix fits easily and
# avoids kernel pipeline setup).  Validated end-to-end on SD1.5 512²
# 50-step (host-forced outputs, 2026-08): flash from seq≥4096 → 1449 ms,
# ≥1024 → 1480 ms, ≥256 → 1514 ms — flash pays only at the longest
# self-attention level.
_FLASH_MIN_Q = 2048
# ... except at head_dim ≤ 64 (SDXL/SVD class), where XLA's materialized
# path is far off roofline while the flash VMEM-resident kernel is not
# (isolated v5e shootout, benchmarks/bench_attention_shapes.py 2026-08:
# (2,20,1024,1024,64) XLA 459 µs vs flash 162 µs; in-context the 60
# XLA-attention fusions cost 29 ms of a 156 ms SDXL UNet eval).
_FLASH_MIN_Q_SMALL_D = 1024
_SMALL_D = 64


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale=None,
    causal: bool = False,
) -> jax.Array:
    """Reference/materializing attention over (B, H, S, D)."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if causal:
        sq, sk = s.shape[-2], s.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        s = jnp.where(col <= row, s, jnp.float32(-1e30))
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    causal: bool = False,
    backend: Optional[str] = None,  # None=auto | 'flash' | 'flash_int8' | 'int8' | 'xla'
    interpret: bool = False,
) -> jax.Array:
    """Attention over (batch, heads, seq, head_dim).

    ``backend='int8'`` is the auto rule with the int8-compute flash
    kernel preferred above the length threshold (short sequences still
    route to XLA, where quantization overhead cannot pay for itself);
    ``'flash_int8'`` forces the int8 kernel unconditionally.
    """
    if backend is None or backend == "int8":
        # Flash pays only when BOTH sequence sides are long: with short
        # kv (cross-attention kv=77) the score matrix is tiny and the
        # flash grid is pure per-instance overhead — measured 153 µs vs
        # ~40 µs XLA for the SD level-0 cross-attention (v5e, 2026-08).
        min_q = (
            _FLASH_MIN_Q_SMALL_D if q.shape[-1] <= _SMALL_D else _FLASH_MIN_Q
        )
        use_flash = q.shape[-2] >= min_q and k.shape[-2] >= min_q
        # Mosaic kernels only lower on TPU; on CPU (tests, cross-backend
        # parity subprocesses) auto mode must fall back to XLA unless the
        # caller explicitly asked for interpret-mode flash.
        if use_flash and not interpret and jax.default_backend() != "tpu":
            use_flash = False
        flash_kind = "flash_int8" if backend == "int8" else "flash"
        backend = flash_kind if use_flash else "xla"
    if backend == "flash":
        # bf16 inputs take the bf16-softmax kernel variant: the big
        # (block_q, block_k) exp runs at packed-VPU rate (measured -2%
        # per call on the SD level-0 shape, 0.2% rms; the row-sum still
        # accumulates f32)
        sm = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
        return flash_attention(
            q, k, v, scale=scale, causal=causal, interpret=interpret,
            softmax_dtype=sm,
        )
    if backend == "flash_int8":
        return flash_attention_int8(
            q, k, v, scale=scale, causal=causal, interpret=interpret
        )
    if backend == "xla":
        return xla_attention(q, k, v, scale=scale, causal=causal)
    if isinstance(backend, tuple) and backend and backend[0] == "ring":
        # sequence-parallel ring attention over a mesh axis:
        # backend = ("ring", mesh, axis_name) — selected by _backends when
        # the compile mesh has a >1 'sp' axis (long-context path)
        if causal:
            raise NotImplementedError("ring attention is non-causal here")
        from sfast_tpu.parallel.ring_attention import ring_attention

        _, mesh, axis = backend
        n = mesh.shape[axis]
        if q.shape[-2] % n != 0 or k.shape[-2] % n != 0:
            # sequence not divisible by the ring (e.g. 77-token
            # cross-attention context) — route to the dense path
            return xla_attention(q, k, v, scale=scale, causal=causal)
        return ring_attention(q, k, v, scale=scale, mesh=mesh, axis=axis)
    raise ValueError(f"unknown attention backend: {backend}")
