"""Activation-range calibration for static-scale W8A8.

Why: dynamic per-tensor quantization (``ops/quant.py``) was measured
END-TO-END and LOSES on v5e (SD1.5 50-step: 2782 ms convs+linears /
1497 ms linears-only vs 1133 ms bf16, 2026-08) even though the int8 MXU
is 1.8–2.4× faster isolated — the per-site ``max(|x|)`` pass is a
cross-fusion scalar dependency and the quantize is an extra full pass.
Static (calibrated) scales remove both: the quantize becomes a plain
elementwise op with a constant scale that XLA fuses into the producer's
epilogue.

Mechanism (works under jit, no eager execution — eager op-by-op over a
tunneled TPU would take hours):

1. **site enumeration**: one ``jax.eval_shape`` trace of the model
   forward with the CONCRETE param tree closed over — the hooks in
   ``layers.apply_linear/apply_conv`` record ``id(p["w"])`` of the real
   weight leaves, in call order, with zero compute;
2. **amax capture**: one jitted forward with params as arguments — the
   hooks append ``max(|x|)`` tracers in the SAME call order, returned
   as extra outputs.  Tracing is single-threaded and deterministic, so
   zip(order₁, order₂) associates each site's weight id with its
   measured activation range.

``Calibration`` carries both the ranges and the exact tree they were
measured on, so ``quantize_pipeline(act_scales=cal)`` can bake
``a_scale`` leaves into the matching param dicts.
"""

import contextlib
import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

_SINK: Optional[dict] = None  # {"mode": "sites"|"amax", "out": list}


@contextlib.contextmanager
def _sink(mode: str, out: List):
    global _SINK
    prev = _SINK
    _SINK = {"mode": mode, "out": out}
    try:
        yield out
    finally:
        _SINK = prev


def record_site(p, x) -> None:
    """Hook called from layers.apply_linear/apply_conv (no-op unless a
    calibration pass is active)."""
    if _SINK is None:
        return
    if _SINK["mode"] == "sites":
        w = p.get("w", p.get("w_q8", p.get("w_q")))
        _SINK["out"].append(id(w) if w is not None else None)
    else:  # amax
        _SINK["out"].append(jnp.max(jnp.abs(x.astype(jnp.float32))))


@dataclasses.dataclass
class Calibration:
    """Per-site activation ranges, tied to the tree they index into."""

    amax: Dict[int, float]  # id(weight leaf) -> max|x| over calibration
    tree: Any  # the unpacked param tree the ids refer to

    def scale_for(self, w) -> Optional[float]:
        a = self.amax.get(id(w))
        return None if a is None else max(a, 1e-6) / 127.0


def calibrate_forward(apply_fn, tree, inputs: Sequence[tuple]) -> Calibration:
    """Run `apply_fn(tree, *args)` over the given input batches and
    return per-site activation ranges.  ``tree`` must be the concrete
    (unpacked) params; ids in the result refer to its leaves."""
    # pass 1: site order, zero compute (tree closed over -> concrete ids)
    sites: List = []
    with _sink("sites", sites):
        jax.eval_shape(lambda *a: apply_fn(tree, *a), *inputs[0])

    # pass 2: jitted amax capture (params as argument)
    def capture(params, *args):
        out: List = []
        with _sink("amax", out):
            apply_fn(params, *args)
        return tuple(out)

    cap = jax.jit(capture)
    amax: Dict[int, float] = {}
    for args in inputs:
        vals = [float(v) for v in cap(tree, *args)]
        if len(vals) != len(sites):
            raise RuntimeError(
                f"calibration call order diverged: {len(sites)} sites vs "
                f"{len(vals)} captures"
            )
        for sid, v in zip(sites, vals):
            if sid is not None:
                amax[sid] = max(amax.get(sid, 0.0), v)
    return Calibration(amax=amax, tree=tree)


def calibrate_pipeline(
    pipe,
    prompt_ids,
    *,
    height: int = 512,
    width: int = 512,
    timesteps: Sequence[int] = (999, 700, 400, 100),
    seed: int = 0,
) -> Calibration:
    """Calibrate the pipeline's UNet activation ranges with real text
    conditioning and sigma-scaled noise latents at several timesteps.

    Approximation note: latents are synthesized per-timestep at the
    scheduler's noise scale rather than produced by running the real
    trajectory — adequate for per-tensor ranges (activations are
    dominated by the conditioning and noise magnitudes), and it keeps
    calibration to a handful of UNet evals."""
    from sfast_tpu.compilers.diffusion_pipeline_compiler import CompiledModel
    from sfast_tpu.runtime.packed_params import PackedParams

    unet = pipe.unet
    model = unet.model if isinstance(unet, CompiledModel) else unet
    params = unet.params
    tree = params.unpack() if isinstance(params, PackedParams) else params

    context = pipe.encode_prompt(prompt_ids)
    b2 = context.shape[0]
    sf = pipe.vae_scale_factor
    lat_c = pipe.vae_config.latent_channels
    shape = (b2, height // sf, width // sf, lat_c)
    state = pipe.scheduler.set_timesteps(50)
    init_sigma = (
        state["init_noise_sigma"]
        if "init_noise_sigma" in state
        else getattr(pipe.scheduler, "init_noise_sigma", 1.0)
    )

    key = jax.random.key(seed)
    inputs = []
    n = len(timesteps)
    for i, t in enumerate(timesteps):
        key, sub = jax.random.split(key)
        # late timesteps carry ~init_sigma-scaled latents, early ~unit
        scale = 1.0 + (float(init_sigma) - 1.0) * (i == 0)
        lat = scale * jax.random.normal(sub, shape, jnp.float32)
        inputs.append(
            (lat.astype(pipe.dtype), jnp.asarray(float(t), jnp.float32), context)
        )

    apply_fn = model.apply_fn(pipe._ccfg)
    return calibrate_forward(apply_fn, tree, inputs)
