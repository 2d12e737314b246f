"""LoRA: loading, merging, and recompile-free hot-swap.

Reference behavior being matched (``README.md:228-265``): after
``compile``, switching LoRA must not retrace/recompile — the reference
does it by in-place ``copy_`` into traced parameters (its
``update_state_dict`` hack).  Here it is structural: weights are
executable *arguments*, so a swap is ``CompiledModel.update_params`` with
freshly merged weights — same executable, new buffers.

Two usage modes:

- **merged** (inference): ``merge_lora(base, lora, scale)`` folds
  ``W + scale·(A·B)`` once per swap; zero per-step cost.
- **unmerged** (training): ``apply`` with LoRA params as a separate
  differentiable pytree (see ``training/lora.py``) — the analog of the
  reference's aot_autograd training path
  (``dynamo/backends/sfast_jit.py:52-64``).

Diffusers/PEFT-format LoRA state dicts are converted by
``convert_diffusers_lora`` (naming knowledge only, no diffusers needed).
"""

import logging
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

# param-tree keys eligible for LoRA injection
_DEFAULT_TARGETS = ("to_q", "to_k", "to_v", "to_out")


def _walk(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _walk(v, path + (i,))
    else:
        yield path, tree


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    for p in path[:-1]:
        tree = tree[p]
    tree[path[-1]] = value


def init_lora_params(
    rng,
    base_params,
    rank: int = 4,
    targets: Tuple[str, ...] = _DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Dict[Tuple, Dict[str, jax.Array]]:
    """Create zero-initialized (B) / gaussian (A) LoRA factors for every
    target linear weight in the tree.  Keyed by param path."""
    lora = {}
    keys = jax.random.split(rng, 4096)
    i = 0
    for path, leaf in _walk(base_params):
        if len(path) >= 2 and path[-1] == "w" and path[-2] in targets:
            din, dout = leaf.shape[-2], leaf.shape[-1]
            lora[path] = {
                "a": jax.random.normal(keys[i % 4096], (din, rank), dtype)
                * (1.0 / rank),
                "b": jnp.zeros((rank, dout), dtype),
            }
            i += 1
    return lora


def merge_lora(base_params, lora, scale: float = 1.0):
    """Return a new param tree with ``W + scale·(A·B)`` folded in.
    Pure/differentiable — used for both swap-in and LoRA training."""

    paths = set(lora.keys())

    def rebuild(tree, path=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, list):
            return [rebuild(v, path + (i,)) for i, v in enumerate(tree)]
        if path in paths:
            f = lora[path]
            delta = (
                f["a"].astype(jnp.float32) @ f["b"].astype(jnp.float32)
            ) * scale
            return (tree.astype(jnp.float32) + delta).astype(tree.dtype)
        return tree

    return rebuild(base_params)


def switch_lora(compiled_model, base_params, lora, scale: float = 1.0) -> None:
    """Hot-swap a compiled model's weights to base+LoRA.  No recompile —
    asserted by tests via ``cache_size`` invariance (the reference's
    ``switch_lora`` check, tests/compilers/...:438-465)."""
    before = compiled_model.cache_size
    compiled_model.update_params(merge_lora(base_params, lora, scale))
    assert compiled_model.cache_size == before


# ---------------------------------------------------------------------------
# diffusers/PEFT LoRA state-dict conversion
# ---------------------------------------------------------------------------

_KEY_RES = [
    # diffusers PEFT style: unet.down_blocks.0.attentions.0.transformer_blocks
    # .0.attn1.to_q.lora_A.weight / lora_B.weight (torch (out,in) layout)
    re.compile(r"(?P<module>.+)\.lora_A\.(?:default\.)?weight$"),
    # kohya style: lora_unet_down_blocks_0_..._to_q.lora_down.weight
    re.compile(r"(?P<module>.+)\.lora_down\.weight$"),
]
_UP_FOR_DOWN = {"lora_A": "lora_B", "lora_down": "lora_up"}


def _module_to_path(module: str) -> Optional[Tuple]:
    """Map a diffusers module string to our param-tree path."""
    m = module
    for prefix in ("unet.", "lora_unet_"):
        if m.startswith(prefix):
            m = m[len(prefix):]
    m = m.replace("_blocks_", "_blocks.").replace("processor.", "")
    # normalize kohya underscores to dots for the numeric separators
    m = re.sub(r"_(\d+)_", r".\1.", m)
    m = re.sub(r"_(\d+)\.", r".\1.", m)
    m = m.replace("transformer_blocks", "blocks")
    parts = []
    for tok in m.split("."):
        if tok.isdigit():
            parts.append(int(tok))
        elif tok in ("attentions", "resnets", "blocks"):
            parts.append(tok)
        elif tok:
            parts.append(tok)
    # our tree: down_blocks.[i].attentions.[j].blocks.[k].attn1.to_q.w
    out: list = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "to_out" and i + 1 < len(parts) and parts[i + 1] == 0:
            out.append("to_out")
            i += 2
            continue
        out.append(p)
        i += 1
    return tuple(out) + ("w",)


def convert_diffusers_lora(
    sd: Dict[str, Any], dtype=jnp.float32
) -> Tuple[Dict[Tuple, Dict[str, jax.Array]], float]:
    """torch LoRA state dict → {path: {a, b}} plus the network alpha/rank
    scale baked in.  Linear (out,in) layouts transposed to (in,out)."""
    from sfast_tpu.interop.torch_bridge import torch_to_jnp

    lora: Dict[Tuple, Dict[str, jax.Array]] = {}
    for key, val in sd.items():
        for pat in _KEY_RES:
            mm = pat.match(key)
            if not mm:
                continue
            module = mm.group("module")
            down_tag = "lora_A" if ".lora_A" in key else "lora_down"
            up_key = key.replace(down_tag, _UP_FOR_DOWN[down_tag])
            if up_key not in sd:
                continue
            path = _module_to_path(module)
            if path is None:
                continue
            a = torch_to_jnp(val.T.contiguous(), dtype)  # (in, r)
            b = torch_to_jnp(sd[up_key].T.contiguous(), dtype)  # (r, out)
            # network alpha scaling if present
            alpha_key = module + ".alpha"
            scale = 1.0
            if alpha_key in sd:
                rank = a.shape[-1]
                scale = float(sd[alpha_key]) / rank
            lora[path] = {"a": a * scale, "b": b}
            break
    if not lora:
        logger.warning("convert_diffusers_lora: no LoRA keys recognized")
    return lora, 1.0
