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

from sfast_tpu.config import CompilationConfig


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

        def apply(params, *args, **kwargs):
            return fwd(cfg, ccfg, params, *args, **kwargs)

        apply.__name__ = self.name or getattr(fwd, "__name__", "apply")
        return apply

    def __call__(self, *args, **kwargs):
        """Eager convenience call (no explicit jit; still traceable)."""
        return self.apply_fn()(self.params, *args, **kwargs)

    def replace_params(self, params) -> "Model":
        return dataclasses.replace(self, params=params)
