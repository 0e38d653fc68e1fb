"""CLI inference: one-shot reenactment of a source portrait by a driver video/images.

Reference parity: notebooks/infer.py InferenceWrapper usage —
  wrapper = InferenceWrapper(experiment_name, ...); out = wrapper.forward(source, driver)

Usage:
  python infer.py --checkpoint-dir ckpts --source face.png --driver-dir frames/ \
      --out-dir out/ [--stage2] [--theta-momentum 0.6]
  python infer.py --random-weights --synthetic-demo   # smoke demo, no data needed
"""
from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--source", type=str, default=None)
    p.add_argument("--driver-dir", type=str, default=None,
                   help="directory of driver frames (sorted)")
    p.add_argument("--out-dir", type=str, default="out")
    p.add_argument("--theta-momentum", type=float, default=0.0)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--synthetic-demo", action="store_true")
    p.add_argument("--tiny", action="store_true", help="tiny model config (smoke)")
    p.add_argument("--fuse-warps", action="store_true", default=True)
    p.add_argument("--bf16", action="store_true", default=True,
                   help="bf16 params+activations (fastest serving mode; see DESIGN.md)")
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from emoportraits_tpu.config import ExperimentConfig
    from emoportraits_tpu.infer.wrapper import InferenceWrapper
    from emoportraits_tpu.models.stage1 import VolumetricAvatar

    if args.checkpoint_dir:
        wrapper = InferenceWrapper.from_checkpoint(
            args.checkpoint_dir, theta_momentum=args.theta_momentum)
    else:
        assert args.random_weights, "--checkpoint-dir or --random-weights required"
        if args.tiny:
            from emoportraits_tpu.config import tiny_config
            cfg = tiny_config()
        else:
            cfg = ExperimentConfig()
        if args.fuse_warps:
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, fuse_warps=True))
        model = VolumetricAvatar(cfg.model)
        s = cfg.train.image_size
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            z = jnp.zeros((1, s, s, 3))
            m1 = jnp.ones((1, s, s, 1))
            th = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), z, m1, z, th, th)
        if args.bf16:
            variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
                variables)
        wrapper = InferenceWrapper(cfg, variables, theta_momentum=args.theta_momentum)

    os.makedirs(args.out_dir, exist_ok=True)

    if args.synthetic_demo:
        rng = np.random.default_rng(0)
        source = (rng.random((512, 512, 3)) * 255).astype(np.uint8)
        drivers = [(rng.random((512, 512, 3)) * 255).astype(np.uint8)
                   for _ in range(3)]
    else:
        source = np.asarray(Image.open(args.source).convert("RGB"))
        frames = sorted(os.listdir(args.driver_dir))
        drivers = [np.asarray(Image.open(
            os.path.join(args.driver_dir, f)).convert("RGB")) for f in frames]

    wrapper.set_source(source)
    import time

    t0 = time.perf_counter()
    for i, frame in enumerate(drivers):
        out = np.asarray(wrapper.forward(frame))[0]
        Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(args.out_dir, f"frame_{i:05d}.png"))
    dt = time.perf_counter() - t0
    print(f"rendered {len(drivers)} frames in {dt:.2f}s "
          f"({len(drivers) / dt:.1f} fps incl. IO) -> {args.out_dir}")


if __name__ == "__main__":
    main()
