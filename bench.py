"""Headline benchmark: frames/sec/chip for 512px per-frame reenactment (the drive step).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. Baseline: the
BASELINE.json north-star of 30 fps per-avatar 512px on one v5e chip (the reference
publishes no numbers — README.md:161-163).

Runs on whatever accelerator jax exposes; params are initialized on the host CPU (fast)
and transferred, then encode_source runs once and the drive step is timed hot.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import dataclasses

    from emoportraits_tpu.config import ExperimentConfig
    from emoportraits_tpu.models.stage1 import VolumetricAvatar

    cfg = ExperimentConfig()
    # serving configuration: composed warp fields (one volume gather per frame)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, fuse_warps=True))
    model = VolumetricAvatar(cfg.model)
    b, s = 1, cfg.train.image_size

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        z = jnp.zeros((b, s, s, 3), jnp.float32)
        m1 = jnp.ones((b, s, s, 1), jnp.float32)
        th = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), z, m1, z, th, th)

    dev = jax.devices()[0]
    # bf16 parameters + activations on device: MXU-native, halves HBM traffic.
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables)
    variables = jax.device_put(variables, dev)
    rng = np.random.default_rng(0)
    bf16 = jnp.bfloat16
    src = jax.device_put(jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32), bf16), dev)
    mask = jax.device_put(jnp.ones((b, s, s, 1), bf16), dev)
    drv = jax.device_put(jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32), bf16), dev)
    theta = jax.device_put(jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4)), dev)

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
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "drive_fps_512px_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
