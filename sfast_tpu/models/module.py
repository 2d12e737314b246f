"""Minimal functional model bundle.

sfast_tpu models are deliberately *not* a module framework: each model
family is a pure ``forward(model_config, compile_config, params, ...)``
function plus an ``init_params`` / weight-converter, bundled here for
ergonomic handling by the pipeline compiler.  This is the design row
"weights-as-arguments" of SURVEY.md §7: parameters are pytree inputs of
the jitted function, never attributes captured by trace — which is what
makes LoRA hot-swap recompile-free.

(The reference instead traces *through* stateful torch modules and then
must fight TorchScript to keep parameters un-folded —
``jit/utils.py:40-89`` ``better_freeze(preserve_parameters=...)``.)
"""

import dataclasses
from typing import Any, Callable, Optional

import jax

from sfast_tpu.config import CompilationConfig


def _transpose_tree(tree, perm4, perm5):
    """Transpose every 4-D/5-D array leaf (layout interop at the model
    boundary — ``CompilationConfig.memory_format='NCHW'``)."""
    import jax.numpy as jnp

    def t(x):
        nd = getattr(x, "ndim", None)
        if nd == 4:
            return jnp.transpose(x, perm4)
        if nd == 5:
            return jnp.transpose(x, perm5)
        return x

    return jax.tree_util.tree_map(t, tree)


@dataclasses.dataclass
class Model:
    """A model = static config + params pytree + pure forward function.

    ``forward`` signature: ``forward(config, compile_config, params,
    *args, **kwargs)``.  ``config`` and ``compile_config`` are Python
    objects closed over at jit time (static); everything else is traced.
    """

    config: Any
    params: Any
    forward: Callable
    name: str = ""
    # kwargs of `forward` that are compile-time flags (hashed by value,
    # baked into the executable) rather than traced arrays
    static_argnames: tuple = ()

    def apply_fn(self, compile_config: Optional[CompilationConfig] = None) -> Callable:
        ccfg = compile_config or CompilationConfig.Default()
        cfg = self.config
        fwd = self.forward
        if ccfg.memory_format not in ("NHWC", "NCHW"):
            raise ValueError(
                f"memory_format must be 'NHWC' or 'NCHW', got "
                f"{ccfg.memory_format!r}"
            )
        # 'NCHW' = torch-layout interop: the caller's 4-D/5-D arrays are
        # channel-first; transpose at the boundary both ways (models are
        # natively NHWC — ≙ reference apply_memory_format, which converts
        # the torch-native layout to the hardware-preferred one).
        from_torch_layout = ccfg.memory_format == "NCHW"

        def apply(params, *args, **kwargs):
            from sfast_tpu.runtime.packed_params import maybe_unpack

            # packed params (few-buffer weight residency) unpack here,
            # inside the traced function: static slices fuse into the
            # consuming ops, and the client only tracks ~3 buffers
            params = maybe_unpack(params)
            if from_torch_layout:
                args, kwargs = _transpose_tree(
                    (args, kwargs), (0, 2, 3, 1), (0, 2, 3, 4, 1)
                )
            if ccfg.prefer_lowp_gemm:
                out = fwd(cfg, ccfg, params, *args, **kwargs)
            else:
                # ≙ reference prefer_lowp_gemm=False: matmuls at full
                # precision (multi-pass bf16 on the MXU ≈ f32)
                with jax.default_matmul_precision("highest"):
                    out = fwd(cfg, ccfg, params, *args, **kwargs)
            if from_torch_layout:
                out = _transpose_tree(out, (0, 3, 1, 2), (0, 4, 1, 2, 3))
            return out

        apply.__name__ = self.name or getattr(fwd, "__name__", "apply")
        return apply

    def __call__(self, *args, **kwargs):
        """Eager convenience call (no explicit jit; still traceable)."""
        return self.apply_fn()(self.params, *args, **kwargs)

    def replace_params(self, params) -> "Model":
        return dataclasses.replace(self, params=params)
