"""Ring attention — sequence-parallel attention over a mesh axis.

SURVEY.md §2.3/§5: the reference has *no* long-context story beyond
xformers' O(n)-memory kernel; ring attention is the TPU-native extension
for sequences that exceed one chip (e.g. SVD temporal×spatial tokens at
high resolution): shard the sequence over a mesh axis, keep Q local, and
rotate K/V shards around the ring with ``jax.lax.ppermute`` (ICI
neighbor transfers) while accumulating an online softmax — compute and
communication overlap, memory per chip is O(S/n).

Pure jnp + collectives under ``shard_map`` — XLA schedules the ICI
transfers; no hand-written RDMA needed (the "don't write comms"
philosophy, SURVEY.md §5).
"""

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

NEG_INF = -1e30


def _ring_attention_local(q, k, v, scale: float, axis_name: str):
    """Per-shard body. q/k/v: (B, H, S_local, D) — the local sequence
    shard; K/V rotate around the ring."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    # fold log₂e into the prescale so the per-step softmax exps are bare
    # exp2 (native on the TPU VPU) — same trick as ops/flash_attention.py
    qf = q.astype(jnp.float32) * (scale * math.log2(math.e))
    b, h, s_loc, d = q.shape

    def step(carry, _):
        k_cur, v_cur, m, l, acc = carry
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32)
        )  # (B,H,Sq,Sk_local)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp2(s - m_new)
        corr = jnp.exp2(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32)
        )
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, m_new, l, acc), None

    init = (
        k,
        v,
        jnp.full((b, h, s_loc, 1), NEG_INF, jnp.float32),
        jnp.zeros((b, h, s_loc, 1), jnp.float32),
        jnp.zeros((b, h, s_loc, d), jnp.float32),
    )
    (k_f, v_f, m, l, acc), _ = jax.lax.scan(step, init, None, length=n)
    return (acc / l).astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "sp",
    scale: Optional[float] = None,
) -> jax.Array:
    """Global attention over (B, H, S, D) with S sharded on ``axis``.

    Non-causal (the diffusion use-case); numerically identical to
    single-device attention (asserted in tests on the virtual mesh).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    spec = P(None, None, axis, None)
    fn = shard_map(
        partial(_ring_attention_local, scale=scale, axis_name=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
    return fn(q, k, v)
