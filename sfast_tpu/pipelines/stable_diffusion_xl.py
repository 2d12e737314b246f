"""SDXL pipeline — dual text encoders + micro-conditioning.

Reference parity: ``compile`` handles ``text_encoder_2`` for SDXL
(``diffusion_pipeline_compiler.py:98-100``) and the benchmark table
tracks SDXL 1024² (BASELINE.md).  Conditioning follows diffusers'
StableDiffusionXLPipeline: context = concat(penultimate hidden states of
both encoders), pooled projection of encoder 2 + time_ids feed the UNet's
``text_time`` addition embedding.
"""

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from sfast_tpu.models.module import Model
from sfast_tpu.pipelines.stable_diffusion import PipelineOutput, StableDiffusionPipeline
from sfast_tpu.models.unet_2d_condition import maybe_stack_iso
from sfast_tpu.runtime.packed_params import maybe_unpack
from sfast_tpu.runtime.tracing import LazyCompiledFunction
from sfast_tpu.utils.image import denormalize_to_uint8, to_pil


class StableDiffusionXLPipeline(StableDiffusionPipeline):
    def __init__(
        self,
        unet: Model,
        vae: Model,
        text_encoder: Model,
        text_encoder_2: Model,
        scheduler,
        *,
        vae_encode: Optional[Model] = None,
        tokenizer=None,
        tokenizer_2=None,
        dtype=jnp.bfloat16,
    ):
        super().__init__(
            unet, vae, text_encoder, scheduler,
            vae_encode=vae_encode, tokenizer=tokenizer, dtype=dtype,
        )
        self.text_encoder_2 = text_encoder_2
        self.tokenizer_2 = tokenizer_2

    def _ids_for_encoder_2(self, prompt, prompt_ids) -> jnp.ndarray:
        """Token ids for text encoder 2 (OpenCLIP ViT-bigG).

        diffusers' SDXL ``tokenizer_2`` shares vocab+merges with
        ``tokenizer`` and differs ONLY in its pad token: ``"!"`` (id 0)
        instead of EOS (``/root/reference`` inherits this via diffusers;
        the reference compiler passes pipelines through untouched,
        ``diffusion_pipeline_compiler.py:98-100``).  So for any prompt the
        two encodings are identical up to and including the first EOS,
        and differ only in the padding tail.

        For string prompts we tokenize with the real ``tokenizer_2``
        (auto-derived from ``tokenizer`` via ``with_pad_token("!")`` when
        not explicitly attached) — exact, including transformers' quirk
        that the added pad token splits out of content text ("hey!!!" →
        three pad ids).  For pre-tokenized ``prompt_ids`` we convert by
        replacing everything after the first EOS with pad id 0, which is
        exact for any prompt not containing the literal pad character."""
        if prompt is not None and self.tokenizer_2 is None and (
            self.tokenizer is not None and hasattr(self.tokenizer, "with_pad_token")
        ):
            try:
                self.tokenizer_2 = self.tokenizer.with_pad_token("!")
            except KeyError:  # vocab without "!" (synthetic test vocabs)
                pass
        if prompt is not None and self.tokenizer_2 is not None:
            if isinstance(prompt, str):
                prompt = [prompt]
            enc = self.tokenizer_2(
                prompt,
                padding="max_length",
                max_length=self.tokenizer_2.model_max_length,
                truncation=True,
                return_tensors="np",
            )
            return jnp.asarray(enc.input_ids, jnp.int32)
        te2 = self.text_encoder_2
        tcfg = te2.model.config if hasattr(te2, "model") else te2.config
        eos = getattr(tcfg, "eos_token_id", 49407)
        pad2 = (
            self.tokenizer_2.pad_token_id if self.tokenizer_2 is not None else 0
        )
        ids = np.asarray(prompt_ids)
        is_eos = ids == eos
        has_eos = is_eos.any(axis=-1)
        first_eos = np.argmax(is_eos, axis=-1)
        # keep the first EOS, pad strictly after it; rows with no EOS
        # (fully-truncated prompts) are left untouched
        after = np.arange(ids.shape[-1])[None, :] > first_eos[:, None]
        out = np.where(after & has_eos[:, None], pad2, ids)
        return jnp.asarray(out, jnp.int32)

    def _time_ids(
        self, original_size, crops, target_size, b, use_cfg=True
    ) -> jax.Array:
        """SDXL micro-conditioning ids, cached on device by value (fresh
        ``jnp.asarray``+``tile`` per call is two buffer round trips inside
        the timed region on a tunneled device).  CFG-doubled rows only
        when the uncond branch runs."""
        rows = 2 * b if use_cfg else b
        return self._dev_const(
            ("time_ids", tuple(original_size), tuple(crops),
             tuple(target_size), rows),
            lambda: jnp.tile(
                jnp.asarray(
                    [list(original_size) + list(crops) + list(target_size)],
                    jnp.float32,
                ),
                (rows, 1),
            ),
        )

    def encode_prompt_xl(self, prompt_ids, prompt_ids_2, negative=False):
        out1 = self.text_encoder(prompt_ids, output_hidden_states=True)
        out2 = self.text_encoder_2(prompt_ids_2, output_hidden_states=True)
        h = jnp.concatenate(
            [out1["hidden_states"][-2], out2["hidden_states"][-2]], axis=-1
        )
        pooled = out2["text_embeds"]
        return h, pooled

    def _build_fused_loop_xl(
        self, num_steps: int, *, use_cfg: bool = True, tcond_dim=None
    ):
        """SDXL denoise loop as ONE executable (micro-conditioning
        tensors are loop-invariant) — same dispatch-amortization story
        as the base pipeline's fused loop.  ``use_cfg=False`` bakes the
        single-batch path (SDXL-Turbo / guidance ≤ 1 / LCM-distilled);
        ``tcond_dim`` threads the LCM guidance embedding."""
        unet_apply = self.unet_model.apply_fn(self._ccfg)
        scheduler = self.scheduler
        needs_noise = getattr(scheduler, "needs_noise", False)

        def loop(
            params, latents, context, state, guidance_scale, key,
            text_embeds, time_ids,
        ):
            params = maybe_stack_iso(maybe_unpack(params))  # hoist out of the loop body
            added = {"text_embeds": text_embeds, "time_ids": time_ids}
            from sfast_tpu.models.layers import lcm_timestep_cond

            tcond = lcm_timestep_cond(
                guidance_scale, tcond_dim, latents.shape[0]
            )

            def body(i, carry):
                lat, st, key = carry
                lat_in = (
                    jnp.concatenate([lat, lat], axis=0) if use_cfg else lat
                )
                lat_in = scheduler.scale_model_input(st, lat_in, i)
                t = st["timesteps"][i]
                tt = jnp.broadcast_to(t, (lat_in.shape[0],))
                kwargs = {}
                if tcond is not None:
                    kwargs["timestep_cond"] = tcond
                eps = unet_apply(
                    params, lat_in, tt, context, added_cond_kwargs=added,
                    **kwargs,
                )
                if use_cfg:
                    eps_u, eps_c = jnp.split(eps, 2, axis=0)
                    eps = eps_u + guidance_scale * (eps_c - eps_u)
                if needs_noise:
                    key, sub = jax.random.split(key)
                    noise = jax.random.normal(sub, lat.shape, jnp.float32)
                    lat, st = scheduler.step(st, eps, i, lat, noise=noise)
                else:
                    lat, st = scheduler.step(st, eps, i, lat)
                return (lat, st, key)

            lat, _, _ = jax.lax.fori_loop(
                0, num_steps, body, (latents, state, key)
            )
            return lat

        return LazyCompiledFunction(
            loop,
            name=f"denoise_loop_xl_{num_steps}"
            + ("" if use_cfg else "_nocfg")
            + (f"_tc{tcond_dim}" if tcond_dim else ""),
        )

    def _build_fused_pipeline_xl(
        self,
        num_steps: int,
        zero_uncond: bool,
        *,
        use_cfg: bool = True,
        tcond_dim=None,
    ):
        """ONE executable for the whole SDXL text2img call: dual prompt
        encode → latent init → N-step loop → VAE decode → uint8 — the
        same single-dispatch amortization as the base pipeline's
        ``_build_fused_pipeline`` (worth ~200 ms there), extended with
        SDXL's dual encoders and micro-conditioning.

        ``zero_uncond`` bakes diffusers' force_zeros_for_empty_prompt
        default (uncond = zero embeddings, no second encode pass)."""
        from sfast_tpu.compilers.diffusion_pipeline_compiler import CompiledModel

        def model_of(m):
            return m.model if isinstance(m, CompiledModel) else m

        te_apply = model_of(self.text_encoder).apply_fn(self._ccfg)
        te2_apply = model_of(self.text_encoder_2).apply_fn(self._ccfg)
        vae_apply = model_of(self.vae).apply_fn(self._ccfg)
        unet_apply = self.unet_model.apply_fn(self._ccfg)
        scheduler = self.scheduler
        needs_noise = getattr(scheduler, "needs_noise", False)
        vae_cfg = self.vae_config
        dtype = self.dtype

        def encode_pair(te_params, te2_params, ids, ids_2):
            o1 = te_apply(te_params, ids, output_hidden_states=True)
            o2 = te2_apply(te2_params, ids_2, output_hidden_states=True)
            h = jnp.concatenate(
                [o1["hidden_states"][-2], o2["hidden_states"][-2]], axis=-1
            )
            return h, o2["text_embeds"]

        def run(
            unet_params,
            te_params,
            te2_params,
            vae_params,
            prompt_ids,
            prompt_ids_2,
            neg_ids,
            neg_ids_2,
            state,
            guidance_scale,
            seed_arr,
            time_ids,
            *,
            lat_shape,
        ):
            cond, pooled_c = encode_pair(
                te_params, te2_params, prompt_ids, prompt_ids_2
            )
            if not use_cfg:
                # single-batch path: no uncond embeddings at all
                context = cond
                added = {"text_embeds": pooled_c, "time_ids": time_ids}
            else:
                if zero_uncond:
                    uncond = jnp.zeros_like(cond)
                    pooled_u = jnp.zeros_like(pooled_c)
                else:
                    uncond, pooled_u = encode_pair(
                        te_params, te2_params, neg_ids, neg_ids_2
                    )
                context = jnp.concatenate([uncond, cond], axis=0)
                added = {
                    "text_embeds": jnp.concatenate(
                        [pooled_u, pooled_c], axis=0
                    ),
                    "time_ids": time_ids,
                }
            from sfast_tpu.models.layers import lcm_timestep_cond

            tcond = lcm_timestep_cond(guidance_scale, tcond_dim, lat_shape[0])
            unet_params_u = maybe_stack_iso(maybe_unpack(unet_params))  # hoist above the loop
            key = jax.random.key(seed_arr[0])
            key, sub = jax.random.split(key)
            latents = jax.random.normal(sub, lat_shape, jnp.float32)
            init_sigma = (
                state["init_noise_sigma"]
                if "init_noise_sigma" in state
                else getattr(scheduler, "init_noise_sigma", 1.0)
            )
            latents = (latents * init_sigma).astype(dtype)
            if hasattr(scheduler, "prepare_state"):
                state_ = scheduler.prepare_state(state, latents)
            else:
                state_ = state

            def body(i, carry):
                lat, st, key = carry
                lat_in = (
                    jnp.concatenate([lat, lat], axis=0) if use_cfg else lat
                )
                lat_in = scheduler.scale_model_input(st, lat_in, i)
                t = st["timesteps"][i]
                tt = jnp.broadcast_to(t, (lat_in.shape[0],))
                kwargs = {}
                if tcond is not None:
                    kwargs["timestep_cond"] = tcond
                eps = unet_apply(
                    unet_params_u, lat_in, tt, context,
                    added_cond_kwargs=added, **kwargs,
                )
                if use_cfg:
                    eps_u, eps_c = jnp.split(eps, 2, axis=0)
                    eps = eps_u + guidance_scale * (eps_c - eps_u)
                if needs_noise:
                    key, sub = jax.random.split(key)
                    noise = jax.random.normal(sub, lat.shape, jnp.float32)
                    lat, st = scheduler.step(st, eps, i, lat, noise=noise)
                else:
                    lat, st = scheduler.step(st, eps, i, lat)
                return (lat, st, key)

            lat, _, _ = jax.lax.fori_loop(
                0, num_steps, body, (latents, state_, key)
            )
            image = vae_apply(vae_params, lat / vae_cfg.scaling_factor)
            return denormalize_to_uint8(image)

        return LazyCompiledFunction(
            run,
            name=f"sdxl_pipeline_{num_steps}"
            + ("" if use_cfg else "_nocfg")
            + (f"_tc{tcond_dim}" if tcond_dim else ""),
            static_argnames=("lat_shape",),
        )

    def __call__(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        *,
        prompt_ids: Optional[jnp.ndarray] = None,
        prompt_ids_2: Optional[jnp.ndarray] = None,
        negative_prompt_ids: Optional[jnp.ndarray] = None,
        negative_prompt_ids_2: Optional[jnp.ndarray] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        seed: int = 0,
        latents: Optional[jnp.ndarray] = None,
        image=None,
        strength: float = 0.8,
        mask_image=None,
        original_size=None,
        crops_coords_top_left=(0, 0),
        target_size=None,
        output_type: str = "np",
        callback_on_step_end=None,
        _warmup_only: bool = False,  # compile-without-execute (see warmup())
    ) -> PipelineOutput:
        self._sched_guard()
        if prompt_ids is None:
            prompt_ids = self.tokenize(prompt)
        if prompt_ids_2 is None:
            prompt_ids_2 = self._ids_for_encoder_2(prompt, prompt_ids)
        if negative_prompt_ids is not None and negative_prompt_ids_2 is None:
            negative_prompt_ids_2 = self._ids_for_encoder_2(
                None, negative_prompt_ids
            )
        b = prompt_ids.shape[0]
        # no-CFG fast path (SDXL Turbo at guidance ≤ 1, LCM-distilled
        # UNets with time_cond_proj_dim): single batch, no uncond encode
        tcond_dim = self._lcm_cond_dim
        use_cfg = tcond_dim is None and guidance_scale > 1.0

        use_full = (
            self._ccfg.fuse_denoising_loop
            and callback_on_step_end is None
            and latents is None
            and image is None
            and output_type in ("np", "pil")
        )
        if mask_image is not None and image is None:
            raise ValueError("inpainting requires `image` with `mask_image`")
        if use_full:
            return self._call_fused_full(
                prompt_ids, prompt_ids_2,
                negative_prompt_ids, negative_prompt_ids_2,
                height=height, width=width,
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale, seed=seed,
                original_size=original_size,
                crops_coords_top_left=crops_coords_top_left,
                target_size=target_size, output_type=output_type,
                _warmup_only=_warmup_only,
            )

        cond, pooled_c = self.encode_prompt_xl(prompt_ids, prompt_ids_2)
        if not use_cfg:
            context, pooled = cond, pooled_c
        elif negative_prompt_ids is None and negative_prompt_ids_2 is None:
            # diffusers SDXL default (force_zeros_for_empty_prompt=True):
            # the uncond branch is ZERO EMBEDDINGS, not an encoded ""
            uncond = jnp.zeros_like(cond)
            pooled_u = jnp.zeros_like(pooled_c)
            context = jnp.concatenate([uncond, cond], axis=0)
            pooled = jnp.concatenate([pooled_u, pooled_c], axis=0)
        else:
            if negative_prompt_ids is None:
                negative_prompt_ids = self._empty_prompt_ids(prompt_ids)
            if negative_prompt_ids_2 is None:
                negative_prompt_ids_2 = negative_prompt_ids
            uncond, pooled_u = self.encode_prompt_xl(
                negative_prompt_ids, negative_prompt_ids_2
            )
            context = jnp.concatenate([uncond, cond], axis=0)
            pooled = jnp.concatenate([pooled_u, pooled_c], axis=0)

        original_size = original_size or (height, width)
        target_size = target_size or (height, width)
        time_ids = self._time_ids(
            original_size, crops_coords_top_left, target_size, b,
            use_cfg=use_cfg,
        )
        added = {"text_embeds": pooled, "time_ids": time_ids}

        vae_cfg = self.vae_config
        sf = self.vae_scale_factor
        state = self._scheduler_state(num_inference_steps)
        key = jax.random.key(seed)
        start_index = 0
        keep_mask = None
        if image is not None:
            # img2img: encode, then forward-noise to the strength point —
            # same path as the base pipeline (stable_diffusion.py) with
            # SDXL micro-conditioning already carried in `added`
            # (≙ reference compiling diffusers' XL img2img transparently,
            # diffusion_pipeline_compiler.py:81-124)
            if self.vae_encode is None:
                raise ValueError("pipeline has no vae_encode model for img2img")
            from sfast_tpu.schedulers.common import add_noise
            from sfast_tpu.utils.image import preprocess_image

            img = preprocess_image(image, self.dtype)
            key, k_enc, k_noise = jax.random.split(key, 3)
            mean, logvar = self.vae_encode(img)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                k_enc, mean.shape, dtype=jnp.float32
            ).astype(mean.dtype)
            z = z * vae_cfg.scaling_factor
            start_index = max(
                num_inference_steps - int(num_inference_steps * strength), 0
            )
            noise = jax.random.normal(k_noise, z.shape, jnp.float32)
            if hasattr(self.scheduler, "add_noise"):
                latents = self.scheduler.add_noise(
                    state, z.astype(jnp.float32), noise, start_index
                )
            else:
                latents = add_noise(
                    state, z.astype(jnp.float32), noise, start_index
                )
            latents = latents.astype(self.dtype)
            if mask_image is not None:
                # inpainting: per-step masked-latent blend (see the base
                # pipeline's _inpaint_blend) on the SDXL latent grid
                from sfast_tpu.utils.image import preprocess_mask_image

                keep_mask = preprocess_mask_image(
                    mask_image, height // sf, width // sf
                )
                inpaint_init = z.astype(jnp.float32)
                inpaint_noise = noise
        elif latents is None:
            key, sub = jax.random.split(key)
            latents = jax.random.normal(
                sub,
                (b, height // sf, width // sf, vae_cfg.latent_channels),
                jnp.float32,
            )
            init_sigma = state["init_noise_sigma"] if "init_noise_sigma" in state else getattr(self.scheduler, "init_noise_sigma", 1.0)
            latents = (latents * init_sigma).astype(self.dtype)
        if hasattr(self.scheduler, "prepare_state"):
            state = self.scheduler.prepare_state(state, latents)

        gs = self._dev_scalar(guidance_scale)
        use_fused = (
            self._ccfg.fuse_denoising_loop
            and callback_on_step_end is None
            and start_index == 0
            and keep_mask is None  # inpaint blends per step (stepwise)
        )
        if use_fused:
            lkey = ("xl", num_inference_steps, use_cfg, tcond_dim)
            fused = self._fused_loops.get(lkey)
            if fused is None:
                fused = self._build_fused_loop_xl(
                    num_inference_steps, use_cfg=use_cfg, tcond_dim=tcond_dim
                )
                self._fused_loops[lkey] = fused
            from sfast_tpu.compilers.diffusion_pipeline_compiler import (
                CompiledModel,
            )

            params = (
                self.unet.params
                if isinstance(self.unet, CompiledModel)
                else self.unet_model.params
            )
            # pass the key as-is (no extra split): the loop body splits
            # once per step exactly like the stepwise path below, so
            # noise-needing schedulers match across paths
            latents = fused(
                params, latents, context, state, gs, key,
                added["text_embeds"], added["time_ids"],
            )
        else:
            needs_noise = getattr(self.scheduler, "needs_noise", False)
            from sfast_tpu.models.layers import lcm_timestep_cond

            tcond = lcm_timestep_cond(gs, tcond_dim, latents.shape[0])
            for i in range(start_index, num_inference_steps):
                t = state["timesteps"][i]
                lat_in = (
                    jnp.concatenate([latents, latents], axis=0)
                    if use_cfg
                    else latents
                )
                lat_in = self.scheduler.scale_model_input(state, lat_in, i)
                tt = jnp.broadcast_to(t, (lat_in.shape[0],))
                kwargs = {}
                if tcond is not None:
                    kwargs["timestep_cond"] = tcond
                eps = self.unet(
                    lat_in, tt, context, added_cond_kwargs=added, **kwargs
                )
                if use_cfg:
                    eps_u, eps_c = jnp.split(eps, 2, axis=0)
                    eps = eps_u + gs * (eps_c - eps_u)
                if needs_noise:
                    key, sub = jax.random.split(key)
                    step_noise = jax.random.normal(
                        sub, latents.shape, jnp.float32
                    )
                    latents, state = self.scheduler.step(
                        state, eps, i, latents, noise=step_noise
                    )
                else:
                    latents, state = self.scheduler.step(state, eps, i, latents)
                if keep_mask is not None:
                    latents = self._inpaint_blend(
                        state, latents, keep_mask, inpaint_init,
                        inpaint_noise, i, num_inference_steps,
                    )
                if callback_on_step_end is not None:
                    callback_on_step_end(self, i, t, {"latents": latents})

        if output_type == "latent":
            return PipelineOutput(latents)
        image = self.vae(latents / vae_cfg.scaling_factor)
        image = denormalize_to_uint8(image)
        if output_type == "pil":
            return PipelineOutput(to_pil(image))
        return PipelineOutput(np.asarray(image))

    def _call_fused_full(
        self,
        prompt_ids,
        prompt_ids_2,
        negative_prompt_ids,
        negative_prompt_ids_2,
        *,
        height,
        width,
        num_inference_steps,
        guidance_scale,
        seed,
        original_size,
        crops_coords_top_left,
        target_size,
        output_type,
        _warmup_only=False,
    ) -> PipelineOutput:
        """Single-dispatch SDXL text2img (see _build_fused_pipeline_xl)."""
        from sfast_tpu.compilers.diffusion_pipeline_compiler import CompiledModel

        b = prompt_ids.shape[0]
        tcond_dim = self._lcm_cond_dim
        use_cfg = tcond_dim is None and guidance_scale > 1.0
        zero_uncond = (
            negative_prompt_ids is None and negative_prompt_ids_2 is None
        )
        if negative_prompt_ids is None:
            negative_prompt_ids = prompt_ids  # placeholder when zero_uncond
        if negative_prompt_ids_2 is None:
            negative_prompt_ids_2 = negative_prompt_ids

        original_size = original_size or (height, width)
        target_size = target_size or (height, width)
        time_ids = self._time_ids(
            original_size, crops_coords_top_left, target_size, b,
            use_cfg=use_cfg,
        )

        state = self._scheduler_state(num_inference_steps)
        vae_cfg = self.vae_config
        sf = self.vae_scale_factor
        lat_shape = (b, height // sf, width // sf, vae_cfg.latent_channels)

        fkey = (
            "xl_full", num_inference_steps, zero_uncond, use_cfg, tcond_dim,
        )
        fp = self._fused_loops.get(fkey)
        if fp is None:
            fp = self._build_fused_pipeline_xl(
                num_inference_steps,
                zero_uncond,
                use_cfg=use_cfg,
                tcond_dim=tcond_dim,
            )
            self._fused_loops[fkey] = fp

        unet_params = (
            self.unet.params
            if isinstance(self.unet, CompiledModel)
            else self.unet_model.params
        )
        full_args = (
            unet_params,
            self.text_encoder.params,
            self.text_encoder_2.params,
            self.vae.params,
            prompt_ids,
            prompt_ids_2,
            negative_prompt_ids,
            negative_prompt_ids_2,
            state,
            self._dev_scalar(guidance_scale),
            np.asarray([seed], np.uint32),
            time_ids,
        )
        if _warmup_only:
            fp.warmup(*full_args, lat_shape=lat_shape)
            return PipelineOutput(None)
        image_out = fp(*full_args, lat_shape=lat_shape)
        try:
            image_out.copy_to_host_async()
        except Exception:
            pass
        if output_type == "pil":
            return PipelineOutput(to_pil(image_out))
        return PipelineOutput(np.asarray(image_out))
