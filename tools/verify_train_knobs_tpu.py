"""TPU smoke: tiny-config full train step on the REAL chip with the batch-2
memory knobs all ON (remat dots + per-block encoder remat, GN lowp stats, Adam
mu/nu bf16), through the public package boundary.

Run: python tools/verify_train_knobs_tpu.py  (needs the TPU; ~1 min compile).
Asserts every metric is finite and params actually move over two steps — the
numerics gate for the knob set DESIGN.md's "train at batch 2" ladder measures."""
import dataclasses, time
import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices())

from emoportraits_tpu.config import tiny_config
from emoportraits_tpu.ops.blocks import set_gn_lowp_stats
from emoportraits_tpu.losses.perceptual import VGGFeatures, VGG19_STAGES
from emoportraits_tpu.models.discriminator import MultiScaleDiscriminator
from emoportraits_tpu.models.head_pose import HeadPoseRegressor
from emoportraits_tpu.models.stage1 import VolumetricAvatar
from emoportraits_tpu.train.forward import make_gen_apply
from emoportraits_tpu.train.state import TrainState
from emoportraits_tpu.train.step import LossTowers, make_train_step

cfg = tiny_config()
cfg = dataclasses.replace(
    cfg,
    model=dataclasses.replace(cfg.model, remat=True, remat_policy="dots"),
    train=dataclasses.replace(cfg.train, bf16_activations=True, bf16_gn_stats=True),
    gen_opt=dataclasses.replace(cfg.gen_opt, mu_bf16=True, nu_bf16=True),
    dis_opt=dataclasses.replace(cfg.dis_opt, mu_bf16=True),
)
set_gn_lowp_stats(True)

KEY = jax.random.PRNGKey(0)
model = VolumetricAvatar(cfg.model)
dis = MultiScaleDiscriminator(cfg.model.discriminator)
hp = HeadPoseRegressor()
b, s = 2, 64
rng = np.random.default_rng(0)
batch = {
    "source_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
    "target_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
    "source_mask": jnp.ones((b, s, s, 1)),
    "target_mask": jnp.ones((b, s, s, 1)),
}
theta = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
gen_vars = model.init(KEY, batch["source_img"], batch["source_mask"],
                      batch["target_img"], theta, theta)
dis_vars = dis.init(KEY, batch["target_img"])
hp_vars = hp.init(KEY, batch["source_img"])
tower = VGGFeatures(stages=VGG19_STAGES)
tower_params = tower.init(KEY, jnp.zeros((1, s, s, 3)))
towers = LossTowers(
    vgg19_apply=tower.apply, vgg19_params=tower_params,
    head_pose_apply=lambda p, x, return_srt=False: hp.apply(p, x, return_srt),
    head_pose_params=hp_vars,
)
gen_apply = make_gen_apply(cfg, model, towers.head_pose_apply, hp_vars)
dis_apply = lambda variables, img: dis.apply(variables, img)
state = TrainState.create(cfg, gen_vars, dis_vars, batch_size=b)

adam16 = state.gen_opt_state[0]
print("gen mu dtypes bf16:", all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(adam16.mu)))
print("gen nu dtypes bf16:", all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(adam16.nu)))

step = make_train_step(cfg, gen_apply, dis_apply, towers)
t0 = time.time()
state2, metrics = step(state, batch, jax.random.PRNGKey(1))
jax.block_until_ready(metrics)
print(f"step1 (compile) {time.time()-t0:.1f}s")
t0 = time.time()
state3, metrics = step(state2, batch, jax.random.PRNGKey(2))
jax.block_until_ready(metrics)
print(f"step2 {time.time()-t0:.3f}s")
bad = {k: float(v) for k, v in metrics.items() if not np.isfinite(float(jnp.asarray(v).mean()))}
print("non-finite metrics:", bad)
print("loss_total:", float(metrics.get("loss_total", jnp.asarray(sum(float(jnp.asarray(v).mean()) for v in metrics.values())))))
d = jax.tree.map(lambda a, b_: float(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32)).max()),
                 state.gen_params, state3.gen_params)
print("max param delta after 2 steps:", max(jax.tree.leaves(d)))
assert not bad
print("OK")
