"""Compilation configuration.

TPU-native analog of ``CompilationConfig.Default`` (reference
``compilers/diffusion_pipeline_compiler.py:20-78``).  Same shape — one
plain dataclass with hardware-probed defaults, no config files — with
knobs mapped to their TPU meaning:

==============================  ==========================================
reference knob                  sfast_tpu knob / meaning here
==============================  ==========================================
memory_format (channels_last)   ``memory_format='NHWC'`` — TPU convs are
                                natively NHWC; this is the default, not an
                                opt-in (reference :29-34).
enable_jit / enable_jit_freeze  ``enable_jit`` / ``freeze`` — freeze closes
                                weights over as XLA constants for
                                constant-folding, sacrificing LoRA hot-swap
                                (reference :35-43 preserve_parameters).
preserve_parameters             ``preserve_parameters`` — weights stay
                                function *arguments* (donated buffers), the
                                default; LoRA swap = overwrite buffers.
enable_cnn_optimization         (no knob) — fused conv+bias+act is
                                unconditional XLA behavior on TPU; there is
                                nothing to switch, so the knob is omitted
                                rather than shipped inert.
enable_fused_linear_geglu       ``enable_fused_linear_geglu`` — Pallas
                                fused dual-matmul GEGLU kernel (≙ CUTLASS
                                dual GEMM, reference :72).
prefer_lowp_gemm                ``prefer_lowp_gemm`` — run matmuls in
                                bfloat16 on the MXU (fp32 accumulate); maps
                                to jax matmul precision (reference :44-48).
enable_xformers                 ``enable_flash_attention`` — Pallas flash
                                attention kernel (reference :49-55).
enable_cuda_graph               ``enable_aot_cache`` — per-shape AOT
                                executable cache, our replay mechanism
                                (reference :56-63 ↔ cuda/graphs.py).
enable_triton                   ``enable_pallas`` — gate all hand-written
                                Pallas kernels at once (reference :64-70).
trace_scheduler                 ``trace_scheduler`` — jit the scheduler
                                step so latents never round-trip to host
                                (reference :74-78).
(new)                           ``fuse_denoising_loop`` — compile the whole
                                N-step denoise loop as one executable via
                                ``lax.fori_loop`` (TPU-only win; disables
                                per-step host callbacks).
(new)                           ``batch_buckets`` — pad leading batch dims
                                up to these buckets to bound compile count.
(new)                           ``cache_dir`` — persistent executable cache.
(new)                           ``mesh`` / ``sharding_rules`` — optional
                                multi-chip sharding (SURVEY.md §2.3: absent
                                in the reference, required for capability
                                parity at scale).
==============================  ==========================================
"""

import dataclasses
from typing import Any, Optional, Sequence, Tuple


def _default_lowp() -> bool:
    """bf16 matmuls are the native fast path on every TPU with an MXU.

    Analog of the reference probing for tensor cores
    (``utils/gpu_device.py:4-15`` feeding ``CompilationConfig:29-34``).
    """
    return True


@dataclasses.dataclass
class CompilationConfig:
    """One plain dataclass of knobs; ``CompilationConfig.Default()`` mirrors
    the reference's ``CompilationConfig.Default`` spelling."""

    # 'NHWC' (TPU-native, default) or 'NCHW' (torch-layout interop: 4-D/5-D
    # model inputs/outputs are transposed at the boundary)
    memory_format: str = "NHWC"
    enable_jit: bool = True  # False: models run uncompiled (still traceable)
    freeze: bool = False  # ≙ enable_jit_freeze + preserve_parameters=False
    preserve_parameters: bool = True  # False ≙ freeze (weights folded in)
    # Pallas GroupNorm / GEGLU win standalone microbenchmarks but lose at
    # model level on v5e (they sit at fusion boundaries XLA would
    # otherwise fuse through).  Validated END-TO-END (SD1.5 512² 50-step,
    # host-forced outputs, 2026-08): flash-only 1480ms < all-XLA 1557ms
    # < pallas GN+GEGLU 1838ms.  Re-validated on SDXL 1024² 30-step
    # (2026-08, after the VMEM block fix): XLA-GN 3932ms < hybrid
    # (Pallas stats + XLA apply) 4653ms < full Pallas GN 4708ms — even
    # though SDXL's XLA GN stats trace at ~24 ms/eval of convert+reduce,
    # pulling them into a kernel forces materializations that cost more.
    # Defaults follow the measurements; both kernels remain opt-in.
    enable_fused_group_norm: bool = False
    enable_fused_linear_geglu: bool = False
    # Pallas fused GN+SiLU→conv3×3 for the resnet blocks (one kernel: 9
    # flat-offset MXU matmuls from VMEM, bf16 single-write output;
    # ops/conv_pallas.py).  Wins ISOLATED benchmarks at the big spatial
    # levels (302 vs 336 µs for the level-0 GN+conv pair) but loses at
    # model level on v5e (22.6 vs 19.1 ms/eval, 2026-08): XLA's
    # stats-fused-into-producer GroupNorm beats any separate stats pass.
    # Opt-in, same documented-negative-result status as the GN/GEGLU
    # kernels above.
    enable_fused_conv: bool = False
    prefer_lowp_gemm: bool = dataclasses.field(default_factory=_default_lowp)
    enable_flash_attention: bool = True
    # int8-compute attention (SageAttention-style quantization in the
    # Pallas flash kernel; v5e int8 MXU ≈ 2× bf16).  ~1e-2 relative
    # output error — the same speed/quality trade the reference's
    # fp16-accumulation lowp GEMMs make (its CompilationConfig:44-48).
    enable_int8_attention: bool = False
    enable_aot_cache: bool = True
    enable_pallas: bool = True
    trace_scheduler: bool = True
    fuse_denoising_loop: bool = False
    compute_dtype: Any = "bfloat16"
    param_dtype: Any = "bfloat16"
    batch_buckets: Optional[Sequence[int]] = None
    cache_dir: Optional[str] = None
    # Multi-chip (beyond reference parity, SURVEY.md §7 stage 7):
    mesh: Any = None  # a jax.sharding.Mesh, or None for single chip
    sharding_rules: Optional[Tuple[Tuple[str, Any], ...]] = None

    @staticmethod
    def Default() -> "CompilationConfig":
        return CompilationConfig()

    def replace(self, **kw) -> "CompilationConfig":
        return dataclasses.replace(self, **kw)
