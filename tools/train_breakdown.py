"""Per-phase train-step breakdown on the real chip (VERDICT r2 #6).

Times four separately-jitted programs at the prod 512px config so the 446 ms/iter
composite can be attributed:

    gen_fwd      gen_apply forward only (model + frozen mask/matting nets)
    gen_loss     gen_apply + the full gen loss stack (all towers), no grads
    gen_grad     value_and_grad of the gen loss (fwd + bwd)
    dis_step     D(real)+D(fake) hinge loss fwd + bwd

The full train step additionally pays the optimizer updates and the metrics
plumbing; (gen_grad + dis_step) vs the measured full step bounds that overhead.
Run:  python tools/train_breakdown.py            (bf16, bf16 towers)
      BENCH_F32_TOWERS=1 python tools/train_breakdown.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from emoportraits_tpu.config import ExperimentConfig
    from emoportraits_tpu.models.discriminator import MultiScaleDiscriminator
    from emoportraits_tpu.models.stage1 import VolumetricAvatar
    from emoportraits_tpu.train.forward import make_gen_apply
    from emoportraits_tpu.train.state import TrainState
    from emoportraits_tpu.train.step import (
        cast_tower_params_bf16,
        gen_losses,
        tower_params_pytree,
    )
    from emoportraits_tpu.train.towers import build_loss_towers

    cfg = ExperimentConfig()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, bf16_activations=True))
    b, s = 1, cfg.train.image_size
    key = jax.random.PRNGKey(0)
    model = VolumetricAvatar(cfg.model)
    dis = MultiScaleDiscriminator(cfg.model.discriminator)
    rng = np.random.default_rng(0)
    batch = {
        "source_img": jnp.asarray(rng.random((b, s, s, 3), np.float32),
                                  jnp.bfloat16),
        "target_img": jnp.asarray(rng.random((b, s, s, 3), np.float32),
                                  jnp.bfloat16),
        "source_mask": jnp.ones((b, s, s, 1), jnp.bfloat16),
        "target_mask": jnp.ones((b, s, s, 1), jnp.bfloat16),
        "target_keypoints": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 68, 2)).astype(np.float32)),
    }
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        theta = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
        gen_vars = jax.jit(model.init)(key, batch["source_img"],
                                       batch["source_mask"],
                                       batch["target_img"], theta, theta)
        dis_vars = jax.jit(dis.init)(key, batch["target_img"])
        towers, frozen = build_loss_towers(cfg, key)
    gen_apply = make_gen_apply(cfg, model, towers.head_pose_apply,
                               towers.head_pose_params,
                               face_parsing=frozen.face_parsing,
                               matting=frozen.matting)
    tp = tower_params_pytree(towers, frozen)
    if not os.environ.get("BENCH_F32_TOWERS"):
        tp = cast_tower_params_bf16(tp)
    state = TrainState.create(cfg, gen_vars, dis_vars, batch_size=b)

    from emoportraits_tpu.train.step import TOWER_PARAM_FIELDS

    fns_only = towers._replace(**{f: None for f in TOWER_PARAM_FIELDS})

    def with_params(tower_params):
        return fns_only._replace(
            **{f: tower_params[f] for f in TOWER_PARAM_FIELDS
               if tower_params.get(f) is not None})

    def gen_fwd(gen_params, sn, batch, rng, tower_params):
        out, _ = gen_apply({"params": gen_params, "sn_state": sn}, batch, rng,
                           tower_params)
        return out["pred_target_img"]

    def gen_loss(gen_params, sn, batch, rng, tower_params, dis_params, dis_sn,
                 prev_targets):
        out, _ = gen_apply({"params": gen_params, "sn_state": sn}, batch, rng,
                           tower_params)
        total, _losses = gen_losses(
            cfg, out, batch,
            lambda ps, img: dis.apply({"params": ps[0], "sn_state": ps[1]}, img),
            (dis_params, dis_sn), with_params(tower_params),
            prev_targets, step_count=jnp.asarray(10 ** 6, jnp.int32))
        return total

    def gen_grad(gen_params, *a):
        return jax.value_and_grad(lambda p: gen_loss(p, *a))(gen_params)

    def dis_step(dis_params, dis_sn, real, fake):
        def loss_fn(p):
            r_s, _ = dis.apply({"params": p, "sn_state": dis_sn}, real)
            f_s, _ = dis.apply({"params": p, "sn_state": dis_sn},
                               jax.lax.stop_gradient(fake))
            loss = 0.0
            for rs, fs in zip(r_s, f_s):
                loss += jnp.mean(jax.nn.relu(1.0 - rs)) \
                    + jnp.mean(jax.nn.relu(1.0 + fs))
            return loss
        return jax.value_and_grad(loss_fn)(dis_params)

    dev = jax.devices()[0]
    gen_params = jax.device_put(state.gen_params, dev)
    gen_sn = jax.device_put(state.gen_sn_state, dev)
    dis_params = jax.device_put(state.dis_params, dev)
    dis_sn = jax.device_put(state.dis_sn_state, dev)
    prev_targets = jax.device_put(state.prev_targets, dev)
    batch = jax.device_put(batch, dev)
    tp = jax.device_put(tp, dev)
    rng_key = jax.random.PRNGKey(1)

    def time_it(name, fn, *args, n=8):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(json.dumps({"phase": name, "ms": round(ms, 1)}), flush=True)
        return ms

    fake = batch["target_img"]
    # BENCH_PHASES: comma-list subset (relay compiles can SIGSEGV transiently;
    # rerun just the missing phases instead of recompiling everything)
    want = os.environ.get("BENCH_PHASES", "gen_fwd,gen_loss_fwd,gen_grad,dis_step")
    want = {p.strip() for p in want.split(",") if p.strip()}
    known = {"gen_fwd", "gen_loss_fwd", "gen_grad", "dis_step"}
    if want - known:
        raise SystemExit(f"BENCH_PHASES contains unknown phases {sorted(want - known)}; "
                         f"known: {sorted(known)}")
    results = {}
    if "gen_fwd" in want:
        results["gen_fwd"] = time_it("gen_fwd", gen_fwd, gen_params, gen_sn,
                                     batch, rng_key, tp)
    if "gen_loss_fwd" in want:
        results["gen_loss_fwd"] = time_it(
            "gen_loss_fwd", gen_loss, gen_params, gen_sn, batch, rng_key, tp,
            dis_params, dis_sn, prev_targets)
    if "gen_grad" in want:
        results["gen_grad"] = time_it(
            "gen_grad", gen_grad, gen_params, gen_sn, batch, rng_key, tp,
            dis_params, dis_sn, prev_targets)
    if "dis_step" in want:
        results["dis_step"] = time_it("dis_step", dis_step, dis_params, dis_sn,
                                      batch["target_img"], fake)
    print(json.dumps({"breakdown_ms": {k: round(v, 1)
                                       for k, v in results.items()},
                      "towers": "f32" if os.environ.get("BENCH_F32_TOWERS")
                      else "bf16"}))


if __name__ == "__main__":
    main()
