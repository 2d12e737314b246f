"""Input-signature hashing for executable dispatch.

The reference uses two flavors of ``hash_arg``:

- shape-**agnostic** for the trace cache (tensors hash to their *type*;
  one TorchScript trace serves all shapes — ``jit/trace_helper.py:109-119``),
- shape-**sensitive** for the CUDA-graph cache (tensors hash to
  ``(device, dtype, shape, value-if-cpu-scalar)`` — ``cuda/graphs.py:225-241``),
  which is the dynamic-shape mechanism: one captured graph per distinct
  shape signature.

Here the XLA executable plays both roles, so the shape-sensitive
signature is the dispatch key.  The shape-agnostic flavor is kept for
API parity and for structure-level caches (e.g. per-pipeline wrapper
reuse).

If the native extension is built, the hot tuple-hash runs in C
(``sfast_tpu._C.sig_hash``); otherwise Python hashing is used — same
graceful degradation the reference applies to its fused ops.
"""

import dataclasses
from typing import Any, Tuple

import numpy as np

try:
    from sfast_tpu import _C  # type: ignore
except ImportError:  # pragma: no cover
    _C = None


def _is_array(x) -> bool:
    # jax.Array and np.ndarray both expose .shape/.dtype; avoid importing
    # jax here to keep signature computation import-light for the C path.
    return hasattr(x, "shape") and hasattr(x, "dtype")


def arg_signature(arg: Any, shape_sensitive: bool = True) -> Tuple:
    """Recursively build a hashable signature tuple for an argument tree."""
    sig_fn = getattr(arg, "__sfast_signature__", None)
    if sig_fn is not None:
        # objects carrying their own (memoized) signature, e.g.
        # runtime.packed_params.PackedParams
        return sig_fn(shape_sensitive)
    if _is_array(arg):
        if shape_sensitive:
            # 0-d host scalars (numpy) hash by value: they are baked into
            # the executable as constants when passed statically, matching
            # the reference's cpu-scalar special case (cuda/graphs.py:233-238).
            if isinstance(arg, np.generic) or (
                isinstance(arg, np.ndarray) and arg.ndim == 0
            ):
                return ("scalar", str(arg.dtype), arg.item())
            return ("array", str(arg.dtype), tuple(arg.shape))
        return ("array_type", type(arg).__name__)
    if arg is None or isinstance(arg, (bool, int, float, str, bytes)):
        return ("prim", type(arg).__name__, arg)
    if isinstance(arg, (list, tuple)):
        return (
            type(arg).__name__,
            tuple(arg_signature(a, shape_sensitive) for a in arg),
        )
    if isinstance(arg, dict):
        return (
            "dict",
            tuple(
                (k, arg_signature(arg[k], shape_sensitive))
                for k in sorted(arg, key=str)
            ),
        )
    if dataclasses.is_dataclass(arg) and not isinstance(arg, type):
        return (
            "dataclass",
            type(arg).__name__,
            tuple(
                (f.name, arg_signature(getattr(arg, f.name), shape_sensitive))
                for f in dataclasses.fields(arg)
            ),
        )
    # Opaque objects hash by type, like the reference's fallback
    # (jit/trace_helper.py:118-119).
    return ("opaque", type(arg).__name__)


def hash_arg(arg: Any, shape_sensitive: bool = True) -> int:
    sig = arg_signature(arg, shape_sensitive)
    if _C is not None and hasattr(_C, "sig_hash"):
        return _C.sig_hash(sig)
    return hash(sig)


def call_signature(args, kwargs, shape_sensitive: bool = True) -> Tuple:
    """Signature for a full call: ``(args, kwargs)`` — the dispatch key
    (reference ``cuda/graphs.py:31``: ``(training, hash args, hash kwargs)``;
    we have no training-mode flag on pure functions).

    Uses the native C recursion (``sfast_tpu._C``) when built — this runs
    on every compiled-model call, the same role the reference gives its
    C++ runtime pieces."""
    if _C is not None and hasattr(_C, "call_signature"):
        try:
            return _C.call_signature(tuple(args), kwargs, shape_sensitive)
        except Exception:  # pragma: no cover - e.g. exotic dataclass args
            pass
    return (
        arg_signature(tuple(args), shape_sensitive),
        arg_signature(kwargs, shape_sensitive),
    )
