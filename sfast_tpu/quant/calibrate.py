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
   forward with a CONCRETE param tree closed over — the hooks in
   ``layers.apply_linear/apply_conv`` record ``id(p["w"])`` of the real
   weight leaves, in call order, with zero compute.  For packed params
   the tree is a zero-byte HOST placeholder (stride-0 broadcasts carved
   from the pack metadata), so enumeration never touches the device;
2. **amax capture**: one jitted forward with params as arguments — the
   hooks append ``max(|x|)`` tracers in the SAME call order, returned
   stacked as ONE array (a single device fetch; per-scalar ``float()``
   fetches are one tunnel round trip EACH).  Tracing is single-threaded
   and deterministic, so zip(order₁, order₂) associates each site's
   weight with its measured activation range.

Ranges are stored keyed by the weight leaf's *tree path* — stable
across pack/unpack/retrace — so ``quantize_pipeline(act_scales=cal)``
can bake ``a_scale`` leaves into the matching param dicts inside a
single jitted transform (object identity would not survive tracing).
"""

import contextlib
import dataclasses
import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# THREAD-LOCAL sink: the hooks fire during tracing in whichever thread
# traces, and a concurrent pipe.warmup(background=True) trace must not
# pollute the site/amax association (shifted zip → wrong a_scale per
# weight, silently).
_TLS = threading.local()


@contextlib.contextmanager
def _sink(mode: str, out: List):
    prev = getattr(_TLS, "sink", None)
    _TLS.sink = {"mode": mode, "out": out}
    try:
        yield out
    finally:
        _TLS.sink = prev


def record_site(p, x) -> None:
    """Hook called from layers.apply_linear/apply_conv (no-op unless a
    calibration pass is active in THIS thread)."""
    sink = getattr(_TLS, "sink", None)
    if sink is None:
        return
    if sink["mode"] == "sites":
        w = p.get("w", p.get("w_q8", p.get("w_q")))
        sink["out"].append(id(w) if w is not None else None)
    else:  # amax
        sink["out"].append(jnp.max(jnp.abs(x.astype(jnp.float32))))


def _norm_key(k):
    if isinstance(k, jax.tree_util.DictKey):
        return k.key
    if isinstance(k, jax.tree_util.SequenceKey):
        return k.idx
    if isinstance(k, jax.tree_util.GetAttrKey):
        return k.name
    if isinstance(k, jax.tree_util.FlattenedIndexKey):
        return k.key
    return k


def _paths_by_id(tree) -> Dict[int, Tuple]:
    """id(leaf) → normalized (key, ...) path, for every leaf of ``tree``."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {id(leaf): tuple(_norm_key(k) for k in path) for path, leaf in flat}


def placeholder_tree(packed):
    """Zero-byte host tree with the shapes/dtypes of a ``PackedParams`` —
    distinct stride-0 numpy leaves, usable for site enumeration (leaf
    identity) without any device traffic."""
    leaves = [
        np.broadcast_to(np.zeros((), np.dtype(dt)), shape)
        for (dt, _offset, shape) in packed.metas
    ]
    return jax.tree_util.tree_unflatten(packed.treedef, leaves)


@dataclasses.dataclass
class Calibration:
    """Per-site activation ranges keyed by the weight leaf's tree path."""

    amax: Dict[Tuple, float]  # path of the weight leaf -> max|x| observed

    def scale_for_path(self, path: Tuple) -> Optional[float]:
        a = self.amax.get(tuple(path))
        return None if a is None else max(a, 1e-6) / 127.0


def calibrate_forward(
    apply_fn, tree, inputs: Sequence[tuple], run_params: Any = None
) -> Calibration:
    """Run ``apply_fn(params, *args)`` over the given input batches and
    return per-site activation ranges keyed by weight path.

    ``tree`` is the concrete (host placeholder or real) param tree used
    only for site enumeration; ``run_params`` (default: ``tree``) is
    what the jitted amax pass actually executes with — pass the packed
    params here so nothing is unpacked eagerly."""
    if run_params is None:
        run_params = tree

    # pass 1: site order, zero compute (tree closed over -> concrete ids)
    sites: List = []
    with _sink("sites", sites):
        jax.eval_shape(lambda *a: apply_fn(tree, *a), *inputs[0])
    paths = _paths_by_id(tree)
    site_paths = [paths.get(sid) for sid in sites]

    # pass 2: jitted amax capture (params as argument, ONE stacked fetch)
    def capture(params, *args):
        out: List = []
        with _sink("amax", out):
            apply_fn(params, *args)
        return jnp.stack(out) if out else jnp.zeros((0,), jnp.float32)

    cap = jax.jit(capture)
    amax: Dict[Tuple, float] = {}
    for args in inputs:
        vals = np.asarray(cap(run_params, *args), np.float32)
        if len(vals) != len(site_paths):
            raise RuntimeError(
                f"calibration call order diverged: {len(site_paths)} sites "
                f"vs {len(vals)} captures"
            )
        for path, v in zip(site_paths, vals):
            if path is not None:
                amax[path] = max(amax.get(path, 0.0), float(v))
    return Calibration(amax=amax)


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
    if isinstance(params, PackedParams):
        tree, run_params = placeholder_tree(params), params
    else:
        tree, run_params = params, params

    apply_fn = model.apply_fn(pipe._ccfg)
    if hasattr(pipe, "encode_prompt_xl"):
        # SDXL: dual-encoder context + required added conditioning
        # (text_embeds + time_ids), CFG batch mirrors __call__'s
        # zero-embedding uncond branch.  COUPLED to the default-args
        # conditioning built in stable_diffusion_xl.py __call__
        # (:250-274) — if that construction changes, update this or
        # calibration measures a different activation distribution
        # than production serves.
        cond, pooled_c = pipe.encode_prompt_xl(prompt_ids, prompt_ids)
        context = jnp.concatenate([jnp.zeros_like(cond), cond], axis=0)
        pooled = jnp.concatenate([jnp.zeros_like(pooled_c), pooled_c], axis=0)
        b2 = context.shape[0]
        time_ids = jnp.tile(
            jnp.asarray([[height, width, 0, 0, height, width]], jnp.float32),
            (b2, 1),
        )
        added = {"text_embeds": pooled, "time_ids": time_ids}
        base_apply = apply_fn
        apply_fn = lambda p, lat, t, ctx: base_apply(  # noqa: E731
            p, lat, t, ctx, added_cond_kwargs=added
        )
    else:
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
    for i, t in enumerate(timesteps):
        key, sub = jax.random.split(key)
        # late timesteps carry ~init_sigma-scaled latents, early ~unit
        scale = 1.0 + (float(init_sigma) - 1.0) * (i == 0)
        lat = scale * jax.random.normal(sub, shape, jnp.float32)
        inputs.append(
            (lat.astype(pipe.dtype), jnp.asarray(float(t), jnp.float32), context)
        )

    return calibrate_forward(apply_fn, tree, inputs, run_params=run_params)


def calibrate_controlnet_pipeline(
    pipe,
    prompt_ids,
    control_image,
    *,
    height: int = 512,
    width: int = 512,
    timesteps: Sequence[int] = (999, 700, 400, 100),
    conditioning_scale: float = 1.0,
    seed: int = 0,
) -> Tuple[Calibration, Calibration]:
    """Calibrate UNet AND ControlNet activation ranges jointly — one
    traced step evaluates the ControlNet and feeds its residuals to the
    UNet, exactly like the fused denoise loop
    (``pipelines/stable_diffusion.py:_unet_eps``), so the UNet sees the
    residual-shifted activation distribution it will serve with.

    Returns ``(unet_cal, controlnet_cal)`` — pass them to
    ``quantize_pipeline(act_scales=unet_cal,
    controlnet_act_scales=controlnet_cal, quantize_controlnet=True)``."""
    from sfast_tpu.compilers.diffusion_pipeline_compiler import CompiledModel
    from sfast_tpu.runtime.packed_params import PackedParams

    if pipe.controlnet is None:
        raise ValueError("pipeline has no controlnet model")

    def split(bundle):
        model = bundle.model if isinstance(bundle, CompiledModel) else bundle
        params = bundle.params
        if isinstance(params, PackedParams):
            return model, placeholder_tree(params), params
        return model, params, params

    unet_model, unet_tree, unet_run = split(pipe.unet)
    cn_model, cn_tree, cn_run = split(pipe.controlnet)
    unet_apply = unet_model.apply_fn(pipe._ccfg)
    cn_apply = cn_model.apply_fn(pipe._ccfg)

    def joint(params, lat_in, tt, context, ctrl):
        down, mid = cn_apply(
            params["controlnet"], lat_in, tt, context, ctrl,
            conditioning_scale=conditioning_scale,
        )
        return unet_apply(
            params["unet"], lat_in, tt, context,
            down_block_additional_residuals=down,
            mid_block_additional_residual=mid,
        )

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

    from sfast_tpu.utils.image import preprocess_control_image

    # caller provides the hint at (height, width) pixel resolution, like
    # __call__; CFG-double to match the batched latents
    ctrl = preprocess_control_image(control_image, pipe.dtype)
    if ctrl.shape[1] != height or ctrl.shape[2] != width:
        raise ValueError(
            f"control image {ctrl.shape[1]}x{ctrl.shape[2]} does not match "
            f"requested {height}x{width}"
        )
    if ctrl.shape[0] != b2:
        ctrl = jnp.tile(ctrl, (b2 // ctrl.shape[0], 1, 1, 1))

    key = jax.random.key(seed)
    inputs = []
    for i, t in enumerate(timesteps):
        key, sub = jax.random.split(key)
        scale = 1.0 + (float(init_sigma) - 1.0) * (i == 0)
        lat = scale * jax.random.normal(sub, shape, jnp.float32)
        tt = jnp.broadcast_to(jnp.asarray(float(t), jnp.float32), (b2,))
        inputs.append((lat.astype(pipe.dtype), tt, context, ctrl))

    tree = {"unet": unet_tree, "controlnet": cn_tree}
    run_params = {"unet": unet_run, "controlnet": cn_run}
    cal = calibrate_forward(joint, tree, inputs, run_params=run_params)
    unet_amax = {
        k[1:]: v for k, v in cal.amax.items() if k and k[0] == "unet"
    }
    cn_amax = {
        k[1:]: v for k, v in cal.amax.items() if k and k[0] == "controlnet"
    }
    return Calibration(amax=unet_amax), Calibration(amax=cn_amax)


def calibrate_svd_pipeline(
    pipe,
    image,
    *,
    num_frames: Optional[int] = None,
    height: int = 576,
    width: int = 1024,
    num_inference_steps: int = 25,
    step_indices: Sequence[int] = (0, 8, 16, 24),
    fps: int = 7,
    motion_bucket_id: int = 127,
    noise_aug_strength: float = 0.02,
    seed: int = 0,
) -> Calibration:
    """Calibrate the SVD UNet's activation ranges with the pipeline's own
    conditioning (CLIP image embedding, noise-augmented cond latents,
    micro-ids — built by ``pipe.prepare_conditioning``, the same code
    ``__call__`` runs) and EDM-scaled latents at several step indices.

    Approximation note (same as :func:`calibrate_pipeline`): latents are
    synthesized per-index at the EDM noise scale ``sigma_i`` rather than
    produced by the real trajectory — after ``scale_model_input`` their
    magnitude matches the serving distribution (~unit), which is what
    per-tensor ranges need."""
    from sfast_tpu.compilers.diffusion_pipeline_compiler import CompiledModel
    from sfast_tpu.runtime.packed_params import PackedParams

    unet = pipe.unet
    model = unet.model if isinstance(unet, CompiledModel) else unet
    params = unet.params
    if isinstance(params, PackedParams):
        tree, run_params = placeholder_tree(params), params
    else:
        tree, run_params = params, params
    apply_fn = model.apply_fn(pipe._ccfg)

    ucfg = pipe.unet_config
    vcfg = pipe.vae_config
    num_frames = num_frames or ucfg.num_frames

    key = jax.random.key(seed)
    context, cond_latents, add_ids, key = pipe.prepare_conditioning(
        image,
        num_frames=num_frames,
        height=height,
        width=width,
        fps=fps,
        motion_bucket_id=motion_bucket_id,
        noise_aug_strength=noise_aug_strength,
        key=key,
    )
    b = context.shape[0] // 2

    sf = 2 ** (len(vcfg.block_out_channels) - 1)
    lh, lw = height // sf, width // sf
    state = pipe.scheduler.set_timesteps(num_inference_steps)

    inputs = []
    for i in step_indices:
        i = int(i)
        if not 0 <= i < num_inference_steps:
            raise ValueError(
                f"step index {i} outside [0, {num_inference_steps})"
            )
        key, sub = jax.random.split(key)
        lat = jax.random.normal(
            sub, (b, num_frames, lh, lw, vcfg.latent_channels), jnp.float32
        )
        lat = (lat * state["sigmas"][i]).astype(pipe.dtype)
        # mirror the denoise-loop body: CFG double batch, EDM input
        # scaling, channel-concat of the conditioning latents
        lat_in = jnp.concatenate([lat, lat], axis=0)
        lat_in = pipe.scheduler.scale_model_input(state, lat_in, i)
        lat_in = jnp.concatenate(
            [lat_in, cond_latents.astype(lat_in.dtype)], axis=-1
        )
        tt = jnp.broadcast_to(state["timesteps"][i], (lat_in.shape[0],))
        inputs.append((lat_in, tt, context, add_ids))

    return calibrate_forward(apply_fn, tree, inputs, run_params=run_params)
