"""Param-tree patching (≙ reference ``utils/patch.py:1-19``
``patch_module`` — recursive module replacement via setattr).

sfast_tpu models are param pytrees, so the equivalent utility walks a
tree and rewrites matching sub-trees/leaves functionally (no mutation).
Used by quantization and IP-Adapter injection; exposed for user-side
surgery (e.g. replacing a specific attention's weights).
"""

from typing import Any, Callable, Tuple


def patch_params(
    tree: Any,
    filter_fn: Callable[[Tuple, Any], bool],
    patch_fn: Callable[[Tuple, Any], Any],
    _path: Tuple = (),
):
    """Return a new tree where every node (dict/list/leaf) for which
    ``filter_fn(path, node)`` is True is replaced by
    ``patch_fn(path, node)``.  Matching is checked before recursion, so a
    patched subtree is not walked further."""
    if filter_fn(_path, tree):
        return patch_fn(_path, tree)
    if isinstance(tree, dict):
        return {
            k: patch_params(v, filter_fn, patch_fn, _path + (k,))
            for k, v in tree.items()
        }
    if isinstance(tree, list):
        return [
            patch_params(v, filter_fn, patch_fn, _path + (i,))
            for i, v in enumerate(tree)
        ]
    return tree
