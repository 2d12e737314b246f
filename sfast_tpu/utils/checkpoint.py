"""Param-tree checkpointing.

SURVEY.md §5: the reference has no checkpoint/resume story at all (model
weights are HF-loaded by user code; compiled state is per-process).
sfast_tpu persists compiled executables via the XLA disk cache
(utils/env.py) and persists *weights* here — so a serving process can
restart into warm executables + local weights without touching torch or
the network.

Format: one .npz per tree (path-flattened keys); bf16 stored as raw
uint16 with a dtype sidecar so numpy portability is not an issue.
"""

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, path=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{path}/{k}" if path else str(k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{path}/[{i}]")
    else:
        yield path, tree


def save_params(path: str, params) -> None:
    arrays: Dict[str, np.ndarray] = {}
    dtypes: Dict[str, str] = {}
    for key, leaf in _flatten(params):
        arr = np.asarray(leaf)
        dtypes[key] = str(arr.dtype)
        if arr.dtype == jnp.bfloat16:
            arr = arr.view(np.uint16)
        arrays[key] = arr
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, __dtypes__=json.dumps(dtypes), **arrays)


def load_params(path: str, *, device_put: bool = True):
    data = np.load(path, allow_pickle=False)
    dtypes = json.loads(str(data["__dtypes__"]))

    leaves = {}
    for key in data.files:
        if key == "__dtypes__":
            continue
        arr = data[key]
        if dtypes[key] == "bfloat16":
            arr = arr.view(jnp.bfloat16)
        leaves[key] = arr

    # rebuild the nested structure from the path keys
    root: Any = {}

    def insert(container, parts, value):
        head = parts[0]
        is_index = head.startswith("[") and head.endswith("]")
        key = int(head[1:-1]) if is_index else head
        if len(parts) == 1:
            if isinstance(container, list):
                while len(container) <= key:
                    container.append(None)
                container[key] = value
            else:
                container[key] = value
            return
        nxt_is_index = parts[1].startswith("[")
        if isinstance(container, list):
            while len(container) <= key:
                container.append(None)
            if container[key] is None:
                container[key] = [] if nxt_is_index else {}
            insert(container[key], parts[1:], value)
        else:
            if key not in container:
                container[key] = [] if nxt_is_index else {}
            insert(container[key], parts[1:], value)

    for key, value in leaves.items():
        insert(root, key.split("/"), value)

    if device_put:
        from sfast_tpu.models.layers import device_put_tree

        return device_put_tree(root)
    return root


def device_memory_stats() -> Dict[str, Any]:
    """Live HBM usage of the default device (observability helper;
    ≙ the reference examples reporting peak VRAM)."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)() or {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
