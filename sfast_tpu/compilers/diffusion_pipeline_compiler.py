"""The public API: ``compile(pipeline, config)``.

TPU-native analog of the reference's pipeline compiler
(``compilers/diffusion_pipeline_compiler.py:81-190``): takes a diffusion
pipeline, finds its heavy submodels (UNet, ControlNet, VAE, text
encoders, image encoder, optionally the scheduler step), and swaps their
forward callables with lazily-compiled XLA executables.

Two kinds of pipeline are accepted (duck-typed, like the reference's
``hasattr`` probing at ``:88-124``):

- **native** sfast_tpu pipelines (``sfast_tpu.pipelines.*``) whose
  submodels are :class:`~sfast_tpu.models.module.Model` bundles
  (pure ``apply`` + params pytree);
- **torch diffusers** pipelines: converted first via
  ``sfast_tpu.interop.diffusers_adapter.convert_pipeline`` (weights are
  extracted from the torch modules into jnp arrays once; forwards are
  re-implemented JAX functions mirroring the diffusers architectures —
  SURVEY.md §7 design mapping row 1).

Everything is lazy: ``compile`` itself compiles nothing; cost is paid on
first call per input signature, mirroring the reference (``:81-124`` —
"compile" only wires up wrappers).
"""

import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp

from sfast_tpu.config import CompilationConfig
from sfast_tpu.runtime.tracing import LazyCompiledFunction
from sfast_tpu.runtime.executable_cache import global_executable_cache

logger = logging.getLogger(__name__)

# Submodel attributes probed on a pipeline, in reference order
# (diffusion_pipeline_compiler.py:88-124).
_SUBMODEL_ATTRS = (
    "unet",
    "controlnet",
    "vae",
    "vae_encode",
    "text_encoder",
    "text_encoder_2",
    "image_encoder",
)


class CompiledModel:
    """A compiled submodel: params pytree + per-signature executables.

    Weights stay call-time *arguments* (``preserve_parameters=True``
    semantics): ``update_params`` (LoRA hot-swap) replaces the pytree
    without touching the executable cache — zero recompilation, the
    TPU answer to the reference's in-place parameter copy
    (``README.md:241-264``).
    """

    def __init__(self, model, config: Optional[CompilationConfig] = None, name=None):
        config = config or CompilationConfig.Default()
        self.model = model
        self.config = config
        self.name = name or type(model).__name__
        self.params = model.params
        # Multi-chip: place params on the mesh per the sharding rules
        # (Megatron TP split by default); XLA GSPMD propagates the layout
        # through the jitted forward and inserts the ICI collectives.
        # Activations are replicated on entry (TP inference); callers may
        # pass pre-sharded arrays (e.g. dp-sharded batch) — any array
        # already committed to this mesh is left alone.
        self._mesh = config.mesh
        self._param_shardings = None
        if self._mesh is not None:
            from sfast_tpu.parallel.sharding import (
                param_shardings,
                spec_fn_from_rules,
                unet_param_spec,
            )

            spec_fn = (
                spec_fn_from_rules(config.sharding_rules)
                if config.sharding_rules
                else unet_param_spec
            )
            self._param_shardings = param_shardings(
                self.params, self._mesh, spec_fn
            )
            self.params = jax.tree_util.tree_map(
                jax.device_put, self.params, self._param_shardings
            )
        apply_fn = model.apply_fn(config)
        # enable_jit=False: run the model through the plain (still
        # traceable) apply function with no executable cache — ≙ the
        # reference skipping lazy_trace when enable_jit is off.
        self._eager = not config.enable_jit
        # preserve_parameters=False is the reference's spelling of
        # "fold the weights in" — same effect as freeze=True here.
        if config.freeze or not config.preserve_parameters:
            # freeze: weights become XLA constants (constant folding on,
            # hot-swap off) — ≙ enable_jit_freeze/preserve_parameters=False
            # (reference diffusion_pipeline_compiler.py:35-43).
            frozen_params = self.params

            def apply_frozen(*args, **kwargs):
                return apply_fn(frozen_params, *args, **kwargs)

            self._call = LazyCompiledFunction(
                apply_frozen,
                name=self.name,
                mode="aot" if config.enable_aot_cache else "jit",
                static_argnames=getattr(model, "static_argnames", ()),
            )
            self._frozen = True
        else:
            self._call = LazyCompiledFunction(
                apply_fn,
                name=self.name,
                mode="aot" if config.enable_aot_cache else "jit",
                static_argnames=getattr(model, "static_argnames", ()),
            )
            self._frozen = False
        global_executable_cache().register(self.name, self._call)

    # sentinel: set after a compile failure — the model then runs eagerly
    # forever, mirroring the reference's per-module `cannot_compile` state
    # (hooks/module_jit_hook.py:54-61, SURVEY.md §5 degrade-gracefully)
    _cannot_compile = False

    def _place_inputs(self, tree):
        """Replicate uncommitted activation arrays onto the mesh; arrays
        the caller already committed to this mesh (dp-sharded batches,
        TP-sharded context) pass through untouched."""
        if self._mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(self._mesh, PartitionSpec())

        def place(x):
            if not isinstance(x, jax.Array):
                return x
            sh = getattr(x, "sharding", None)
            if isinstance(sh, NamedSharding) and sh.mesh == self._mesh:
                return x
            return jax.device_put(x, repl)

        return jax.tree_util.tree_map(place, tree)

    def __call__(self, *args, **kwargs):
        if self._mesh is not None:
            args, kwargs = self._place_inputs((args, kwargs))
        if not self._cannot_compile and not self._eager:
            try:
                if self._frozen:
                    return self._call(*args, **kwargs)
                return self._call(self.params, *args, **kwargs)
            except Exception as e:
                # Shape/tracing errors in user inputs should surface;
                # compiler/runtime failures degrade to eager.
                if not self._is_compile_failure(e):
                    raise
                logger.warning(
                    "sfast_tpu: compilation of %s failed (%s); falling back "
                    "to uncompiled execution for this model",
                    self.name,
                    type(e).__name__,
                )
                self._cannot_compile = True
        apply_fn = self.model.apply_fn(self.config)
        return apply_fn(self.params, *args, **kwargs)

    @staticmethod
    def _is_compile_failure(e: Exception) -> bool:
        """Classify by exception TYPE, not message text: XLA compiler /
        runtime errors (``jax.errors.JaxRuntimeError``, the base of
        ``XlaRuntimeError`` — covers compilation failures, Mosaic kernel
        failures, RESOURCE_EXHAUSTED) degrade this model to eager.
        Anything raised while *tracing* — user shape or dtype errors
        (TypeError/ValueError), even when their message happens to
        mention "XLA" — propagates to the caller."""
        return isinstance(e, jax.errors.JaxRuntimeError)

    def warmup(self, *args, **kwargs):
        if self._eager:
            return self
        if self._mesh is not None:
            args, kwargs = self._place_inputs((args, kwargs))
        if self._frozen:
            self._call.warmup(*args, **kwargs)
        else:
            self._call.warmup(self.params, *args, **kwargs)
        return self

    def update_params(self, new_params, allow_restructure: bool = False) -> None:
        """Hot-swap weights (LoRA switch). Structure and shapes must match;
        a mismatch would silently force a recompile, so it is checked.
        ``allow_restructure=True`` accepts a deliberate structure change
        (e.g. the quantization transform's w → w_q/w_q8 rewrite) — the new
        structure keys fresh executables."""
        if self._frozen:
            raise RuntimeError(
                "model was compiled with freeze=True; weights are baked "
                "constants and cannot be hot-swapped (recompile with "
                "preserve_parameters=True)"
            )
        old_struct = jax.tree_util.tree_structure(self.params)
        new_struct = jax.tree_util.tree_structure(new_params)
        if old_struct != new_struct:
            if not allow_restructure:
                raise ValueError(
                    f"param tree structure changed: {old_struct} != {new_struct}"
                )
            if self._param_shardings is not None:
                from sfast_tpu.parallel.sharding import (
                    param_shardings,
                    spec_fn_from_rules,
                    unet_param_spec,
                )

                spec_fn = (
                    spec_fn_from_rules(self.config.sharding_rules)
                    if self.config.sharding_rules
                    else unet_param_spec
                )
                self._param_shardings = param_shardings(
                    new_params, self._mesh, spec_fn
                )
                new_params = jax.tree_util.tree_map(
                    jax.device_put, new_params, self._param_shardings
                )
            self.params = new_params
            self._sync_model_params()
            return
        if self._param_shardings is not None:
            # keep the mesh placement stable across hot-swaps so the
            # executable's input layout (and thus the cache) is unchanged
            self.params = jax.tree_util.tree_map(
                lambda old, new, s: jax.device_put(
                    jnp.asarray(new, old.dtype), s
                ),
                self.params,
                new_params,
                self._param_shardings,
            )
        else:
            self.params = jax.tree_util.tree_map(
                lambda old, new: jnp.asarray(new, old.dtype), self.params, new_params
            )
        self._sync_model_params()

    def _sync_model_params(self) -> None:
        """Point the wrapped model bundle at the swapped params.

        Without this the old tree stays reachable through ``self.model``
        forever — for a quantized SDXL UNet that silently pins the
        5.1 GB bf16 PackedParams flat buffer NEXT TO its 2.5 GB int8
        replacement (measured RESOURCE_EXHAUSTED at the first post-
        quantize 1024² call on a 16 GB v5e, 2026-08-19; jax.live_arrays
        showed both buffers resident)."""
        if hasattr(self.model, "replace_params"):
            self.model = self.model.replace_params(self.params)

    @property
    def cache_size(self) -> int:
        return self._call.cache_size

    def clear_cache(self) -> None:
        """Drop every cached executable (program-changing env flip)."""
        self._call.clear_cache()


def compile_model(model, config=None, name=None) -> CompiledModel:
    """Compile one submodel bundle (generic entry, used by all of the
    ``compile_*`` helpers below)."""
    return CompiledModel(model, config, name)


def compile_unet(unet, config=None) -> CompiledModel:
    """≙ reference ``compile_unet`` (:127-151): xformers→flash-attention,
    memory_format→NHWC, lazy trace→lazy jit, CUDA graph→AOT cache are all
    folded into the model's ``apply_fn(config)``."""
    return compile_model(unet, config, name="unet")


def compile_vae(vae, config=None) -> CompiledModel:
    """≙ reference ``compile_vae`` (:154-190). The reference compiles the
    VAE per-submodule and skips CUDA graphs for it (SDXL fp32-upcast memory
    issue, :184-188); XLA executables have no capture-time memory pinning,
    so the VAE takes the same path as everything else here."""
    return compile_model(vae, config, name="vae")


def _looks_like_torch_module(m) -> bool:
    return hasattr(m, "state_dict") and hasattr(m, "named_parameters")


def _is_native_model(m) -> bool:
    return hasattr(m, "apply_fn") and hasattr(m, "params")


def compile(pipeline: Any, config: Optional[CompilationConfig] = None):
    """Compile a diffusion pipeline in place and return it.

    Mirrors the reference top-level ``compile`` (:81-124): walks the
    known submodel slots, wraps each; optionally wraps the scheduler's
    ``scale_model_input``/``step`` (``trace_scheduler``).
    """
    config = config or CompilationConfig.Default()

    needs_conversion = any(
        _looks_like_torch_module(getattr(pipeline, a, None)) for a in _SUBMODEL_ATTRS
    )
    if needs_conversion:
        from sfast_tpu.interop.diffusers_adapter import convert_pipeline

        pipeline = convert_pipeline(pipeline, config)

    for attr in _SUBMODEL_ATTRS:
        sub = getattr(pipeline, attr, None)
        if sub is None or isinstance(sub, CompiledModel):
            continue
        if _is_native_model(sub):
            compiled = compile_model(sub, config, name=attr)
            setattr(pipeline, attr, compiled)
            logger.info("sfast_tpu: compiled %s", attr)

    scheduler = getattr(pipeline, "scheduler", None)
    if scheduler is not None and config.trace_scheduler:
        from sfast_tpu.schedulers.compile import compile_scheduler

        pipeline.scheduler = compile_scheduler(scheduler)

    if hasattr(pipeline, "set_compilation_config"):
        pipeline.set_compilation_config(config)
    return pipeline
