"""Param-tree int8 quantization transform.

User-facing analog of ``torch.quantization.quantize_dynamic(unet,
{nn.Linear}, qint8)`` on the reference (``README.md:276-287``): one call
converts every (eligible) linear weight in a model's param tree to int8 +
per-channel scales.  The forward path picks quantized weights up
transparently (``models/layers.apply_linear``), so the transform composes
with ``compile`` and LoRA merge-on-top is still possible by dequantizing
first.
"""

from typing import Tuple

import jax.numpy as jnp

from sfast_tpu.ops.quant import quantize_weight

# linear parents quantized by default — attention projections and MLPs
# carry ~90% of SD UNet linear weights (conv weights stay bf16, like the
# reference quantizing only nn.Linear)
_DEFAULT_TARGETS = (
    "to_q",
    "to_k",
    "to_v",
    "to_out",
    "proj",
    "out",
    "fc1",
    "fc2",
    "proj_in",
    "proj_out",
)


def quantize_linear_params(
    params,
    targets: Tuple[str, ...] = _DEFAULT_TARGETS,
    min_features: int = 64,
    mode: str = "w8a16",  # 'w8a16' (memory win) | 'w8a8' (int8 compute)
    act_scales=None,  # quant.calibrate.Calibration -> static a_scale
):
    """Return a new tree where every 2-D ``w`` under a target key becomes
    ``{"w_q": int8, "w_scale": f32}`` (bias preserved).  ``mode='w8a8'``
    stores the weight under ``w_q8`` instead, which routes the forward
    through the full-int8 matmul (dynamic activation quantization); with
    ``act_scales`` (path-keyed, from ``quant.calibrate``) a static
    ``a_scale`` is baked in so the quantize fuses into the producer
    epilogue."""
    key = "w_q8" if mode == "w8a8" else "w_q"
    if mode not in ("w8a16", "w8a8"):
        raise ValueError(mode)

    def rebuild(tree, path=()):
        if isinstance(tree, dict):
            if (
                "w" in tree
                and getattr(tree["w"], "ndim", 0) == 2
                and path
                and path[-1] in targets
                and tree["w"].shape[0] >= min_features
            ):
                wq, scale = quantize_weight(tree["w"])
                out = {k: v for k, v in tree.items() if k != "w"}
                out[key] = wq
                out["w_scale"] = scale
                if act_scales is not None and mode == "w8a8":
                    a = act_scales.scale_for_path(path + ("w",))
                    if a is not None:
                        out["a_scale"] = jnp.float32(a)
                return out
            return {k: rebuild(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, list):
            return [rebuild(v, path + (i,)) for i, v in enumerate(tree)]
        return tree

    return rebuild(params)


# conv parents quantized by the W8A8 transform (resnet/resampling convs —
# the FLOP carriers; conv_in/out & proj convs excluded by default for
# quality at the pixel boundaries)
_CONV_TARGETS = ("conv1", "conv2", "conv_shortcut", "conv")


def quantize_pipeline(
    pipe,
    mode: str = "w8a16",
    quantize_convs: bool = False,
    act_scales=None,  # quant.calibrate.Calibration (static-scale W8A8)
    quantize_controlnet: bool = False,
    controlnet_act_scales=None,
):
    """One-call pipeline quantization — the UX analog of the reference's
    ``torch.quantization.quantize_dynamic(m.unet, {nn.Linear}, qint8)``
    (``examples/optimize_stable_diffusion_pipeline.py:186-209``).

    Quantizes the UNet's linear weights (and, for ``mode='w8a8'`` with
    ``quantize_convs=True``, its resnet convs) in place via
    ``update_params`` — composes with ``compile`` before or after; the
    structure change (w → w_q/w_q8) keys a fresh executable.  Passing
    ``act_scales`` from :func:`sfast_tpu.quant.calibrate_pipeline`
    selects the static-scale variant (the dynamic one is a measured
    end-to-end loss on v5e — see ``quant/calibrate.py``).

    ``quantize_controlnet=True`` applies the same transform to
    ``pipe.controlnet`` (its trunk is the UNet encoder — same key
    layout; the 1×1 zero-conv projections and the hoisted
    cond-embedding stack stay full precision by target selection), with
    ``controlnet_act_scales`` from
    :func:`sfast_tpu.quant.calibrate_controlnet_pipeline`.  Returns the
    pipeline."""
    import jax

    from sfast_tpu.runtime.packed_params import PackedParams, pack_tree

    if quantize_convs and mode != "w8a8":
        raise ValueError("quantize_convs requires mode='w8a8'")
    if quantize_controlnet and getattr(pipe, "controlnet", None) is None:
        raise ValueError("quantize_controlnet=True but pipeline has no controlnet")

    def apply_to(bundle, scales):
        params = bundle.params

        def transform(tree):
            tree = quantize_linear_params(tree, mode=mode, act_scales=scales)
            if quantize_convs:
                tree = quantize_conv_params(tree, act_scales=scales)
            return tree

        if isinstance(params, PackedParams):
            # ONE executable: unpack → quantize every site → repack.  The
            # eager per-leaf version (~700 tiny ops) took >1 h over a
            # tunneled device; this is one compile + one dispatch.
            new_params = jax.jit(
                lambda pp: pack_tree(transform(pp.unpack()))
            )(params)
        else:
            new_params = transform(params)
        if hasattr(bundle, "update_params"):
            bundle.update_params(new_params, allow_restructure=True)
            return bundle
        return bundle.replace_params(new_params)

    pipe.unet = apply_to(pipe.unet, act_scales)
    if quantize_controlnet:
        pipe.controlnet = apply_to(pipe.controlnet, controlnet_act_scales)
    return pipe


def quantize_conv_params(
    params,
    targets: Tuple[str, ...] = _CONV_TARGETS,
    min_channels: int = 64,
    act_scales=None,  # quant.calibrate.Calibration -> static a_scale
):
    """W8A8 conv transform (EXPERIMENTAL): every 4-D HWIO ``w`` under a
    target key becomes int8 + per-out-channel scales; the forward runs
    full-int8 convs with dynamic per-tensor activation quantization
    (``ops.quant.conv2d_w8a8`` — 2× MXU rate on v5e), or static scales
    when ``act_scales`` (path-keyed, from ``quant.calibrate``) is
    given."""
    from sfast_tpu.ops.quant import quantize_conv_weight

    def rebuild(tree, path=()):
        if isinstance(tree, dict):
            if (
                "w" in tree
                and getattr(tree["w"], "ndim", 0) == 4
                and path
                and path[-1] in targets
                and tree["w"].shape[-2] >= min_channels
            ):
                wq, scale = quantize_conv_weight(tree["w"])
                out = {k: v for k, v in tree.items() if k != "w"}
                out["w_q"] = wq
                out["w_scale"] = scale
                if act_scales is not None:
                    a = act_scales.scale_for_path(path + ("w",))
                    if a is not None:
                        out["a_scale"] = jnp.float32(a)
                return out
            return {k: rebuild(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, list):
            return [rebuild(v, path + (i,)) for i, v in enumerate(tree)]
        return tree

    return rebuild(params)
