"""Sharding rules for the model families (GSPMD annotations).

Tensor-parallel layout for the UNet/CLIP attention+MLP stacks (the
Megatron split, expressed as PartitionSpecs — XLA inserts the psums):

- column-parallel: ``to_q/to_k/to_v`` weights ``(d, d)`` → ``P(None, 'tp')``
  (head dimension sharded; attention runs per-shard heads);
- row-parallel: ``to_out`` ``(d, d)`` → ``P('tp', None)`` (XLA emits the
  all-reduce after the contraction);
- GEGLU/MLP: ``ff.proj`` column-parallel, ``ff.out`` row-parallel;
- convs / norms / embeddings: replicated (spatial conv sharding needs
  halo exchange and only pays off beyond single-image latency targets);
- activations: batch over ``dp``.

SURVEY.md §2.3: the reference has none of this; §7 stage 7 calls for it
as the optional capability-at-scale extension.
"""

import fnmatch
from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL = ("to_q", "to_k", "to_v", "proj")
_ROW = ("to_out", "out")
_COL_ALSO = ("fc1",)
_ROW_ALSO = ("fc2",)


def unet_param_spec(path: Tuple, leaf) -> P:
    """PartitionSpec for one param-tree leaf (path of dict keys / list
    indices from the model root)."""
    keys = [p for p in path if isinstance(p, str)]
    if len(keys) >= 2 and keys[-1] == "w" and getattr(leaf, "ndim", 0) == 2:
        parent = keys[-2]
        if parent in _COL or parent in _COL_ALSO:
            return P(None, "tp")
        if parent in _ROW or parent in _ROW_ALSO:
            return P("tp", None)
    return P()  # replicated


def spec_fn_from_rules(rules):
    """Build a ``(path, leaf) -> PartitionSpec`` function from
    ``CompilationConfig.sharding_rules``: a sequence of
    ``(pattern, PartitionSpec)`` pairs where ``pattern`` is an fnmatch
    glob over the '/'-joined param path (e.g. ``"*/to_q/w"``).  First
    match wins; no match → replicated."""
    rules = tuple(rules)

    def spec_fn(path: Tuple, leaf) -> P:
        name = "/".join(str(p) for p in path)
        for pattern, spec in rules:
            if fnmatch.fnmatch(name, pattern):
                return spec if isinstance(spec, P) else P(*spec)
        return P()

    return spec_fn


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec() -> P:
    return P("dp")


def _tree_map_with_path(fn, tree, path=()):
    if isinstance(tree, dict):
        return {k: _tree_map_with_path(fn, v, path + (k,)) for k, v in tree.items()}
    if isinstance(tree, list):
        return [
            _tree_map_with_path(fn, v, path + (i,)) for i, v in enumerate(tree)
        ]
    return fn(path, tree)


def param_shardings(params, mesh: Mesh, spec_fn=unet_param_spec):
    """Pytree of NamedShardings matching ``params``."""
    return _tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_fn(path, leaf)), params
    )


def shard_params(params, mesh: Mesh, spec_fn=unet_param_spec):
    """Place ``params`` on the mesh according to the rules."""
    shardings = param_shardings(params, mesh, spec_fn)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )
