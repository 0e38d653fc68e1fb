"""Headline benchmark: frames/sec/chip for 512px per-frame reenactment (the drive step).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. Baseline: the
BASELINE.json north-star of 30 fps per-avatar 512px on one v5e chip (the reference
publishes no numbers — README.md:161-163).

Env knobs:
  BENCH_MODE = fused_bf16 (default) | plain_f32 | fused_f32 | plain_bf16
      fused_* composes the uv+rotation warps into one volume gather (cfg.fuse_warps);
      bf16 runs parameters+activations in bfloat16.
  BENCH_BATCH = concurrent avatars per chip (default 1).

Measured on TPU v5e (single chip, 512px): plain_f32 41.6 fps, fused_f32 43.4,
plain_bf16 53.6, fused_bf16 54.6 fps.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from emoportraits_tpu.config import ExperimentConfig
    from emoportraits_tpu.models.stage1 import VolumetricAvatar

    mode = os.environ.get("BENCH_MODE", "fused_bf16")
    batch = int(os.environ.get("BENCH_BATCH", "1"))

    cfg = ExperimentConfig()
    if "fused" in mode:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, fuse_warps=True))
    model = VolumetricAvatar(cfg.model)
    b, s = batch, cfg.train.image_size

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        z = jnp.zeros((b, s, s, 3), jnp.float32)
        m1 = jnp.ones((b, s, s, 1), jnp.float32)
        th = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), z, m1, z, th, th)

    dtype = jnp.bfloat16 if "bf16" in mode else jnp.float32
    if dtype == jnp.bfloat16:
        variables = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables)

    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)
    rng = np.random.default_rng(0)
    src = jax.device_put(jnp.asarray(rng.random((b, s, s, 3), np.float32), dtype), dev)
    mask = jax.device_put(jnp.ones((b, s, s, 1), dtype), dev)
    drv = jax.device_put(jnp.asarray(rng.random((b, s, s, 3), np.float32), dtype), dev)
    theta = jax.device_put(jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4)),
                           dev)

    enc = jax.jit(lambda v, s_, m_, t_: model.apply(v, s_, m_, t_,
                                                    method=model.encode_source))
    drv_fn = jax.jit(lambda v, st, d, t: model.apply(v, st, d, t, method=model.drive)[0])

    state = enc(variables, src, mask, theta)
    jax.block_until_ready(state)
    img = drv_fn(variables, state, drv, theta)
    img.block_until_ready()

    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        img = drv_fn(variables, state, drv, theta)
    img.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    fps = batch / dt

    print(json.dumps({
        "metric": "drive_fps_512px_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
