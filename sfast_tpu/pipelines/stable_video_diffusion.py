"""Stable Video Diffusion pipeline (image → video).

Reference parity: SVD-XT is a headline metric (47 s/clip, BASELINE.md);
the reference compiles the SVD UNet/VAE/image_encoder the usual way and
relies on chunked VAE decode for memory
(``examples/optimize_stable_video_diffusion_pipeline.py:49-51,229``,
SURVEY.md §5 long-context notes).

Flow (diffusers StableVideoDiffusionPipeline semantics):

1. conditioning image → CLIP-vision embedding (1 context token) and
   VAE-encoded conditioning latents (noise-augmented, repeated per frame,
   channel-concatenated with the noisy latents — UNet in_channels=8);
2. micro-conditioning (fps, motion_bucket_id, noise_aug_strength) through
   the SVD addition embedding;
3. EDM-Euler denoising with a per-frame linear guidance ramp
   (min→max guidance across the clip);
4. chunked VAE decode of the frames (``decode_chunk_size``).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sfast_tpu.config import CompilationConfig
from sfast_tpu.compilers.diffusion_pipeline_compiler import CompiledModel
from sfast_tpu.models.module import Model
from sfast_tpu.pipelines.stable_diffusion import PipelineOutput
from sfast_tpu.schedulers.edm_euler import EDMEulerScheduler
from sfast_tpu.utils.image import denormalize_to_uint8, preprocess_image

# CLIP image normalization constants
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _resize_bilinear(img: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(img, (img.shape[0], h, w, img.shape[-1]), "bilinear")


class StableVideoDiffusionPipeline:
    def __init__(
        self,
        unet: Model,
        vae: Model,
        image_encoder: Model,
        scheduler=None,
        *,
        vae_encode: Optional[Model] = None,
        dtype=jnp.bfloat16,
    ):
        self.unet = unet
        self.vae = vae
        self.vae_encode = vae_encode
        self.image_encoder = image_encoder
        self.scheduler = scheduler or EDMEulerScheduler()
        self.dtype = dtype
        self._ccfg = CompilationConfig.Default()
        self._sched_states = {}
        self._sched_obj = self.scheduler
        self._fused_loops = {}
        self._decode_u8 = None

    def set_compilation_config(self, ccfg):
        self._ccfg = ccfg
        self._fused_loops = {}
        self._decode_u8 = None

    def _sched_guard(self):
        if self._sched_obj is not self.scheduler:
            self._sched_states = {}
            self._fused_loops = {}
            self._sched_obj = self.scheduler

    def _build_fused_loop(self, num_steps: int):
        """The whole SVD denoise loop as ONE executable (lax.fori_loop):
        conditioning latents, context, guidance ramp and micro-ids are
        loop-invariant; per-step host dispatch (a tunnel round trip each)
        disappears — the same fusion the SD/SDXL pipelines apply."""
        from sfast_tpu.runtime.packed_params import maybe_unpack
        from sfast_tpu.runtime.tracing import LazyCompiledFunction

        unet_model = (
            self.unet.model if isinstance(self.unet, CompiledModel) else self.unet
        )
        unet_apply = unet_model.apply_fn(self._ccfg)
        scheduler = self.scheduler

        def loop(params, latents, cond_latents, context, add_ids, g, state):
            params_u = maybe_unpack(params)

            def body(i, carry):
                lat, st = carry
                lat_in = jnp.concatenate([lat, lat], axis=0)
                lat_in = scheduler.scale_model_input(st, lat_in, i)
                lat_in = jnp.concatenate(
                    [lat_in, cond_latents.astype(lat_in.dtype)], axis=-1
                )
                t = st["timesteps"][i]
                tt = jnp.broadcast_to(t, (lat_in.shape[0],))
                out = unet_apply(params_u, lat_in, tt, context, add_ids)
                out_u, out_c = jnp.split(out, 2, axis=0)
                model_out = out_u + g * (out_c - out_u)
                lat, st = scheduler.step(st, model_out, i, lat)
                return (lat, st)

            lat, _ = jax.lax.fori_loop(0, num_steps, body, (latents, state))
            return lat

        return LazyCompiledFunction(loop, name=f"svd_denoise_loop_{num_steps}")

    def _build_decode_u8(self):
        """Per-chunk decode → uint8 as ONE executable.  Two wins over
        decode-all-then-convert-then-fetch (trace 2026-08-19, 25f
        576×1024: VAE decode 2.86 s, final uint8 fetch ≈ 2 s of 44 MB
        over the tunnel): the eager denormalize ops collapse into the
        decode dispatch, and because chunk dispatches are async the host
        fetch of chunk i overlaps the device decode of chunks i+1.. —
        the decode tail and the frame download pipeline instead of
        serializing."""
        from sfast_tpu.runtime.tracing import LazyCompiledFunction

        vae_model = (
            self.vae.model if isinstance(self.vae, CompiledModel) else self.vae
        )
        vae_apply = vae_model.apply_fn(self._ccfg)
        is_temporal = getattr(self.vae_config, "temporal_decoder", False)

        def dec(params, chunk):
            if is_temporal:
                img = vae_apply(params, chunk, num_frames=chunk.shape[0])
            else:
                img = vae_apply(params, chunk)
            return denormalize_to_uint8(img)

        return LazyCompiledFunction(dec, name="svd_decode_u8")

    def _scheduler_state(self, num_steps: int):
        """Cached device-resident scheduler state (read-only downstream;
        see StableDiffusionPipeline._scheduler_state for the rationale)."""
        entry = self._sched_states.get(num_steps)
        if entry is not None and entry[0] is self.scheduler:
            return entry[1]
        state = self.scheduler.set_timesteps(num_steps)
        self._sched_states[num_steps] = (self.scheduler, state)
        return state

    @property
    def unet_config(self):
        m = self.unet.model if isinstance(self.unet, CompiledModel) else self.unet
        return m.config

    @property
    def vae_config(self):
        m = self.vae.model if isinstance(self.vae, CompiledModel) else self.vae
        return m.config

    def _encode_image(self, image):
        """image: (B, H, W, 3) in [-1, 1] → CLIP embedding tokens (B, 1, D)."""
        enc_cfg = (
            self.image_encoder.model.config
            if isinstance(self.image_encoder, CompiledModel)
            else self.image_encoder.config
        )
        px = (image.astype(jnp.float32) + 1.0) / 2.0
        px = _resize_bilinear(px, enc_cfg.image_size, enc_cfg.image_size)
        px = (px - _CLIP_MEAN) / _CLIP_STD
        out = self.image_encoder(px.astype(self.dtype))
        emb = out.get("image_embeds", out["pooler_output"])
        return emb[:, None, :]

    def prepare_conditioning(
        self,
        image,
        *,
        num_frames: int,
        height: int,
        width: int,
        fps: int = 7,
        motion_bucket_id: int = 127,
        noise_aug_strength: float = 0.02,
        key=None,
    ):
        """Build the UNet's loop-invariant conditioning exactly as
        ``__call__`` does: CLIP image embedding with the CFG
        zero-embedding row, noise-augmented conditioning latents repeated
        per frame (uncond branch zeroed), and the (fps, motion, aug)
        micro-ids.  Shared with :func:`sfast_tpu.quant.calibrate_svd_pipeline`
        so calibration measures the same activation distribution the
        pipeline serves.  Returns ``(context, cond_latents, add_ids, key)``."""
        if key is None:
            key = jax.random.key(0)
        img = preprocess_image(image, self.dtype)
        img = _resize_bilinear(img.astype(jnp.float32), height, width).astype(
            self.dtype
        )
        b = img.shape[0]

        # 1. CLIP image embedding (+ CFG zero-embedding)
        emb = self._encode_image(img)
        context = jnp.concatenate([jnp.zeros_like(emb), emb], axis=0)

        # 2. conditioning latents (mode of the posterior, noise-augmented,
        # NOT scaled by scaling_factor — SVD convention)
        key, k_aug = jax.random.split(key)
        aug = jax.random.normal(k_aug, img.shape, jnp.float32)
        img_aug = img.astype(jnp.float32) + noise_aug_strength * aug
        mean, _ = self.vae_encode(img_aug.astype(self.dtype))
        cond_latents = mean  # (B, h, w, 4)
        cond_latents = jnp.repeat(cond_latents[:, None], num_frames, axis=1)
        # CFG: unconditional branch gets zeroed conditioning latents
        cond_latents = jnp.concatenate(
            [jnp.zeros_like(cond_latents), cond_latents], axis=0
        )

        # 3. micro-conditioning
        add_ids = jnp.asarray(
            [[fps - 1, motion_bucket_id, noise_aug_strength]], jnp.float32
        )
        add_ids = jnp.tile(add_ids, (2 * b, 1))
        return context, cond_latents, add_ids, key

    def __call__(
        self,
        image,
        *,
        num_frames: Optional[int] = None,
        height: int = 576,
        width: int = 1024,
        num_inference_steps: int = 25,
        min_guidance_scale: float = 1.0,
        max_guidance_scale: float = 3.0,
        fps: int = 7,
        motion_bucket_id: int = 127,
        noise_aug_strength: float = 0.02,
        decode_chunk_size: Optional[int] = None,
        seed: int = 0,
        output_type: str = "np",
    ) -> PipelineOutput:
        self._sched_guard()
        ucfg = self.unet_config
        vcfg = self.vae_config
        num_frames = num_frames or ucfg.num_frames
        decode_chunk_size = decode_chunk_size or num_frames
        context, cond_latents, add_ids, key = self.prepare_conditioning(
            image,
            num_frames=num_frames,
            height=height,
            width=width,
            fps=fps,
            motion_bucket_id=motion_bucket_id,
            noise_aug_strength=noise_aug_strength,
            key=jax.random.key(seed),
        )
        b = context.shape[0] // 2

        # 4. latents
        sf = 2 ** (len(vcfg.block_out_channels) - 1)
        lh, lw = height // sf, width // sf
        state = self._scheduler_state(num_inference_steps)
        key, k_lat = jax.random.split(key)
        latents = jax.random.normal(
            k_lat, (b, num_frames, lh, lw, vcfg.latent_channels), jnp.float32
        )
        latents = (latents * state["init_noise_sigma"]).astype(self.dtype)

        # per-frame guidance ramp
        g = jnp.linspace(
            min_guidance_scale, max_guidance_scale, num_frames, dtype=jnp.float32
        )[None, :, None, None, None]

        if self._ccfg.fuse_denoising_loop:
            fused = self._fused_loops.get(num_inference_steps)
            if fused is None:
                fused = self._build_fused_loop(num_inference_steps)
                self._fused_loops[num_inference_steps] = fused
            latents = fused(
                self.unet.params, latents, cond_latents, context, add_ids,
                g, state,
            )
        else:
            for i in range(num_inference_steps):
                t = state["timesteps"][i]
                lat_in = jnp.concatenate([latents, latents], axis=0)
                lat_in = self.scheduler.scale_model_input(state, lat_in, i)
                lat_in = jnp.concatenate(
                    [lat_in, cond_latents.astype(lat_in.dtype)], axis=-1
                )
                tt = jnp.broadcast_to(t, (2 * b,))
                out = self.unet(lat_in, tt, context, add_ids)
                out_u, out_c = jnp.split(out, 2, axis=0)
                model_out = out_u + g * (out_c - out_u)
                latents, state = self.scheduler.step(state, model_out, i, latents)

        if output_type == "latent":
            return PipelineOutput(latents)

        # 5. chunked decode (decode_chunk_size frames per executable call).
        # With the temporal VAE decoder (AutoencoderKLTemporalDecoder —
        # what real SVD checkpoints ship), each chunk is decoded with
        # frame-aware temporal smoothing, exactly like diffusers'
        # decode_latents; a standard KL decoder decodes per-frame.
        flat = latents.reshape(b * num_frames, lh, lw, vcfg.latent_channels)
        flat = flat / vcfg.scaling_factor
        if self._decode_u8 is None:
            self._decode_u8 = self._build_decode_u8()
        vae_params = self.vae.params
        # enqueue ALL chunk decodes (async dispatch), then fetch in
        # order: chunk i downloads while chunks i+1.. still decode
        outs = [
            self._decode_u8(vae_params, flat[s : s + decode_chunk_size])
            for s in range(0, flat.shape[0], decode_chunk_size)
        ]
        np_out = [np.asarray(o) for o in outs]
        frames = np.concatenate(np_out, axis=0).reshape(
            b, num_frames, height, width, 3
        )
        return PipelineOutput(frames)
