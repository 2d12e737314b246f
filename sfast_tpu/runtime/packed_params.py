"""Packed parameter trees — few-buffer weight residency.

Why: every device buffer is a unit of client↔device bookkeeping.  An
SD1.5 UNet has ~700 weight leaves; over a tunneled TPU their first
materialization costs ~0.33 s **per buffer** (~230 s total, measured
2026-08 — the dominant term of the process warm start, dwarfing the
3 s cache-hit XLA compile).  The reference meets the same genus of
problem (per-tensor bookkeeping at CUDA-graph capture) with its
flat-tensors subsystem (``src/sfast/utils/flat_tensors.py``): flatten
everything into one buffer and carve views.

TPU-native version: pack all leaves of each dtype into ONE flat device
array, and carve the tree back out with static slices *inside* the
traced model function.  XLA fuses a static slice+reshape into the
consuming op's operand read, so steady-state cost is ~zero; the client
side only ever sees a handful of buffers.

``PackedParams`` is a registered pytree whose children are the packed
flat arrays, so it flows through ``jax.jit``, signature hashing, and
LoRA hot-swap (``update_params`` with a same-shape packed tree) without
special cases.  ``Model.apply_fn`` unpacks transparently at entry.
"""

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class PackedParams:
    """A param pytree stored as one flat array per dtype.

    ``packed``: {dtype_str: flat array (device or host)}
    ``metas``:  per-leaf (dtype_str, offset, shape), in treedef leaf order
    ``treedef``: the original tree structure
    """

    def __init__(self, packed: Dict[str, Any], metas: Tuple, treedef):
        self.packed = packed
        self.metas = metas
        self.treedef = treedef
        self._struct_hash = None  # lazy; metas/treedef are immutable

    # -- pytree protocol --------------------------------------------------
    def tree_flatten(self):
        keys = tuple(sorted(self.packed))
        children = tuple(self.packed[k] for k in keys)
        return children, (keys, self.metas, self.treedef)

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, metas, treedef = aux
        return cls(dict(zip(keys, children)), metas, treedef)

    # -- signature (fast dispatch hashing) --------------------------------
    def __sfast_signature__(self, shape_sensitive: bool) -> Tuple:
        if not shape_sensitive:
            return ("packed_type",)
        if self._struct_hash is None:
            self._struct_hash = hash((self.metas, self.treedef))
        return (
            "packed",
            tuple(
                (k, str(v.dtype), tuple(v.shape))
                for k, v in sorted(self.packed.items())
            ),
            self._struct_hash,
        )

    def unpack(self):
        """Carve the original tree out of the flat buffers.

        Traceable: under jit the slices are static and fuse into
        consumers; eagerly it materializes views once.
        """
        leaves = []
        for dtype_key, offset, shape in self.metas:
            size = 1
            for s in shape:
                size *= s
            flat = self.packed[dtype_key]
            leaves.append(
                jax.lax.slice(flat, (offset,), (offset + size,)).reshape(shape)
            )
        return jax.tree_util.tree_unflatten(self.treedef, leaves)


def pack_tree(tree) -> PackedParams:
    """Pack a (host or device) param tree into one flat array per dtype.

    Host numpy leaves stay host-side (transfer with ``device_put_packed``
    or implicitly at first jitted use); device leaves are concatenated on
    device.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    by_dtype: Dict[str, list] = {}
    metas = []
    all_host = all(isinstance(l, (np.ndarray, np.generic)) for l in leaves)
    for leaf in leaves:
        key = str(leaf.dtype)
        buf = by_dtype.setdefault(key, [])
        offset = sum(int(np.prod(a.shape)) for a in buf)
        metas.append((key, offset, tuple(leaf.shape)))
        buf.append(leaf)
    if all_host:
        packed = {
            k: np.concatenate([np.asarray(a).reshape(-1) for a in v])
            if len(v) > 1
            else np.asarray(v[0]).reshape(-1)
            for k, v in by_dtype.items()
        }
    else:
        packed = {
            k: jnp.concatenate([jnp.reshape(a, (-1,)) for a in v])
            if len(v) > 1
            else jnp.reshape(v[0], (-1,))
            for k, v in by_dtype.items()
        }
    return PackedParams(packed, tuple(metas), treedef)


def device_put_packed(tree, device=None) -> PackedParams:
    """Pack on host and transfer — one copy per dtype instead of one per
    leaf (~3 buffers instead of ~700 for an SD UNet)."""
    if device is None:
        device = jax.devices()[0]
    pp = tree if isinstance(tree, PackedParams) else pack_tree(tree)
    packed = {k: jax.device_put(v, device) for k, v in pp.packed.items()}
    return PackedParams(packed, pp.metas, pp.treedef)


def packed_zeros_like(tree) -> PackedParams:
    """Device PackedParams of zeros with the tree's shapes/dtypes.

    Touches no leaf data (works with stride-0 placeholder leaves from
    ``layers.shape_only_init``): only shapes are read, and the flat
    buffers are created ON device — one per dtype, one executable.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    totals: Dict[str, int] = {}
    metas = []
    for leaf in leaves:
        key = str(leaf.dtype)
        offset = totals.get(key, 0)
        metas.append((key, offset, tuple(leaf.shape)))
        totals[key] = offset + int(np.prod(leaf.shape))
    keys = sorted(totals)
    dtypes = {k: jnp.dtype(k) for k in keys}
    packed = jax.jit(
        lambda: {k: jnp.zeros((totals[k],), dtypes[k]) for k in keys}
    )()
    return PackedParams(packed, tuple(metas), treedef)


def packed_normal_like(tree, seed: int = 0, std: float = 0.05) -> PackedParams:
    """Device PackedParams of N(0, std²) values (integer dtypes: zeros).

    Nonzero placeholder weights for numeric-agreement checks — e.g. the
    W8A8-vs-bf16 latent-MSE bound in ``benchmarks/bench_w8a8.py`` — where
    ``packed_zeros_like`` would make every comparison trivially 0==0,
    while real initializers cost ~135 s of host RNG (see module doc)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    totals: Dict[str, int] = {}
    metas = []
    for leaf in leaves:
        key = str(leaf.dtype)
        offset = totals.get(key, 0)
        metas.append((key, offset, tuple(leaf.shape)))
        totals[key] = offset + int(np.prod(leaf.shape))
    keys = sorted(totals)
    dtypes = {k: jnp.dtype(k) for k in keys}

    def build(key):
        out = {}
        for i, k in enumerate(keys):
            if jnp.issubdtype(dtypes[k], jnp.floating):
                out[k] = std * jax.random.normal(
                    jax.random.fold_in(key, i), (totals[k],), dtypes[k]
                )
            else:
                out[k] = jnp.zeros((totals[k],), dtypes[k])
        return out

    packed = jax.jit(build)(jax.random.key(seed))
    return PackedParams(packed, tuple(metas), treedef)


def maybe_unpack(params):
    """Transparent unpack hook for model apply functions."""
    if isinstance(params, PackedParams):
        return params.unpack()
    return params


def tree_map_packed(fn, pp: PackedParams) -> PackedParams:
    """Apply a leaf-wise function through the packed representation
    (unpack → map → repack) — for weight transforms like LoRA merge."""
    return pack_tree(jax.tree_util.tree_map(fn, pp.unpack()))
