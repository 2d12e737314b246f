#!/usr/bin/env python
"""LoRA text-to-image fine-tuning with the compiled train step
(≙ reference ``examples/optimize_train_text_to_image_lora.py``, which
wires sfast's aot_autograd dynamo backends into the HF LoRA trainer).

Here the full train step (forward + backward + AdamW) is ONE jitted XLA
executable, optionally sharded dp×tp over a mesh.  Data loading is left
to the caller (pass pre-encoded latents + text embeddings); this example
trains on synthetic data to demonstrate the path end-to-end.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import time

import jax
import jax.numpy as jnp

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.unet_2d_condition import SD15_UNET, create_unet
from sfast_tpu.parallel import make_mesh, shard_params
from sfast_tpu.training import lora_training_setup, make_lora_train_step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rank", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--mesh", default=None, help="e.g. 2x4 for dp=2,tp=4")
    args = p.parse_args()

    unet = create_unet(SD15_UNET)
    lora, tx, opt_state = lora_training_setup(
        unet, rank=args.rank, learning_rate=args.lr
    )
    train_step = jax.jit(make_lora_train_step(unet, tx, ccfg=CompilationConfig.Default()))

    base = unet.params
    if args.mesh:
        dp, tp = (int(v) for v in args.mesh.split("x"))
        mesh = make_mesh((dp, tp), ("dp", "tp"))
        ctx = mesh
        base = shard_params(base, mesh)
    else:
        import contextlib

        ctx = contextlib.nullcontext()

    key = jax.random.key(0)
    with ctx:
        for step in range(args.steps):
            key, k1, k2, k3 = jax.random.split(key, 4)
            batch = {
                "latents": jax.random.normal(k1, (args.batch, 64, 64, 4)),
                "context": jax.random.normal(k2, (args.batch, 77, 768)),
            }
            t0 = time.time()
            lora, opt_state, loss = train_step(lora, opt_state, base, batch, k3)
            loss = float(loss)
            print(f"step {step}: loss {loss:.4f} ({(time.time()-t0)*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
