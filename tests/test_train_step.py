"""End-to-end train-step test on the tiny config: one full gen+dis step updates params,
metrics finite, negatives queue rotates — the reference's training_step semantics
(train.py:396-464) in one jitted program."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from emoportraits_tpu.config import tiny_config
from emoportraits_tpu.losses.perceptual import VGGFeatures, VGG19_STAGES
from emoportraits_tpu.models.discriminator import MultiScaleDiscriminator
from emoportraits_tpu.models.head_pose import HeadPoseRegressor
from emoportraits_tpu.models.stage1 import VolumetricAvatar
from emoportraits_tpu.train.forward import make_gen_apply
from emoportraits_tpu.train.state import TrainState, param_count
from emoportraits_tpu.train.step import LossTowers, make_train_step

KEY = jax.random.PRNGKey(0)

# compile-heavy e2e: excluded from the quick loop via `-m "not slow"`
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
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
    step = make_train_step(cfg, gen_apply, dis_apply, towers)
    return cfg, state, step, batch


def test_one_train_step(setup):
    cfg, state, step, batch = setup
    jitted = jax.jit(step)
    new_state, metrics = jitted(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite: {v}"
    # params actually moved
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.gen_params, new_state.gen_params)
    assert max(jax.tree.leaves(delta)) > 0
    d_delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                           state.dis_params, new_state.dis_params)
    assert max(jax.tree.leaves(d_delta)) > 0
    # expression losses present (mixing/cycle branch ran)
    assert "gen/pull_exp" in metrics and "gen/volumes_l1" in metrics
    # negatives queue picked up the new batch embeds
    assert float(jnp.abs(new_state.prev_targets).sum()) > 0


def test_donated_state_fully_aliases(setup):
    """Donation-coverage audit (VERDICT r4 next #7): with the production
    `donate_argnums=(0,)` (parallel/mesh.py:113), EVERY TrainState leaf — params,
    both Adam moment trees for both optimizers, EMA, the negatives ring, the
    thetas pool, sn_state, counters — must appear in the compiled program's
    input-output aliasing table. A leaf that silently falls out doubles its HBM
    footprint at 512px (the r4 batch-2 OOM dump showed output aliasing only
    1.56 G of 1.75 G args). Gate: aliased bytes >= the donated state's total."""
    import re

    cfg, state, step, batch = setup
    jitted = jax.jit(step, donate_argnums=(0,))
    compiled = jitted.lower(state, batch, jax.random.PRNGKey(1)).compile()
    # parse the resolved aliasing table out of the optimized-HLO module header.
    # Output indices map 1:1 onto the flattened (new_state, metrics) tuple —
    # new_state leaves first — so index i < n_state_out IS state leaf i.
    # (Input param numbers are NOT usable for this map: jit prunes unused args
    # and XLA renumbers, which a first version of this test learned the hard way.)
    header = compiled.as_text().split("\n", 1)[0]
    m = re.search(r"input_output_alias=\{(.*?)\}, entry_computation_layout",
                  header)
    assert m, "no input_output_alias table in the compiled program"
    out_aliased = {int(e) for e in
                   re.findall(r"\{(\d+)\}:\s*\(\d+,\s*\{[\d\s,]*\}", m.group(1))}
    out_leaves = jax.tree_util.tree_flatten_with_path(
        jax.eval_shape(step, state, batch, jax.random.PRNGKey(1))[0])[0]

    def pstr(path):
        return "/".join(str(getattr(k, "key", getattr(k, "name", "?")))
                        for k in path)

    # every leaf >= 64 KB must alias (measured: XLA declines per-output aliasing
    # only for tiny packed outputs — 32-128 B Adam-nu norm scales, ~58 KB total
    # on the tiny config — which is allocation packing, not an HBM leak)
    big_missing = [
        (pstr(p), int(l.size * l.dtype.itemsize))
        for i, (p, l) in enumerate(out_leaves)
        if i not in out_aliased and l.size * l.dtype.itemsize >= 65536]
    assert not big_missing, (
        f"large TrainState leaves fell out of the aliasing table (each doubles "
        f"its HBM footprint at 512px): {big_missing[:8]}")
    # and the total non-aliased residue stays tiny
    small_bytes = sum(int(l.size * l.dtype.itemsize)
                      for i, (p, l) in enumerate(out_leaves)
                      if i not in out_aliased)
    state_bytes = sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(state))
    assert small_bytes <= max(262144, state_bytes // 64), (
        f"non-aliased state residue grew to {small_bytes} bytes")


def test_two_steps_stable(setup):
    cfg, state, step, batch = setup
    jitted = jax.jit(step)
    s1, m1 = jitted(state, batch, jax.random.PRNGKey(1))
    s2, m2 = jitted(s1, batch, jax.random.PRNGKey(2))
    assert int(s2.step) == 2
    assert np.isfinite(float(m2["gen/total"]))


def test_remat_towers_metric_equivalent(setup):
    """TrainConfig.remat_towers wraps the frozen loss towers in jax.checkpoint —
    recompute vs store is a memory knob only: every metric of one full step must
    match the non-remat step to fp tolerance (train/step.py remat_towers)."""
    import dataclasses

    cfg, state, step, batch = setup
    _, base = jax.jit(step)(state, batch, jax.random.PRNGKey(1))

    cfg_r = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, remat_towers=True))
    # rebuild the step fn with the same towers/applies (reuse the module-scoped
    # setup's closures via a fresh make_train_step at the remat config)
    model = VolumetricAvatar(cfg_r.model)
    hp = HeadPoseRegressor()
    tower = VGGFeatures(stages=VGG19_STAGES)
    s = batch["source_img"].shape[1]
    hp_vars = hp.init(KEY, batch["source_img"])
    towers = LossTowers(
        vgg19_apply=tower.apply,
        vgg19_params=tower.init(KEY, jnp.zeros((1, s, s, 3))),
        head_pose_apply=lambda p, x, return_srt=False: hp.apply(p, x, return_srt),
        head_pose_params=hp_vars,
    )
    gen_apply = make_gen_apply(cfg_r, model, towers.head_pose_apply, hp_vars)
    dis = MultiScaleDiscriminator(cfg_r.model.discriminator)
    step_r = make_train_step(cfg_r, gen_apply,
                             lambda variables, img: dis.apply(variables, img), towers)
    _, got = jax.jit(step_r)(state, batch, jax.random.PRNGKey(1))

    assert set(got) == set(base)
    for k in sorted(base):
        np.testing.assert_allclose(float(got[k]), float(base[k]),
                                   rtol=2e-4, atol=1e-6, err_msg=k)


def test_adam_bf16_moment_knobs_track_f32_adam():
    """OptimizerConfig.mu_bf16 / nu_bf16 (the batch-2 512px HBM knobs): the
    low-precision-moment AdamW must (a) keep the SAME opt-state pytree
    structure as optax.adamw (checkpoint compatibility), (b) persist the
    moments in bf16, and (c) track the f32 trajectory on a quadratic to within
    bf16 moment-rounding (the documented ~0.4%-relative step noise)."""
    import dataclasses

    from emoportraits_tpu.config import OptimizerConfig
    from emoportraits_tpu.train.state import make_optimizer

    cfg32 = OptimizerConfig()
    cfg16 = dataclasses.replace(cfg32, mu_bf16=True, nu_bf16=True)
    assert cfg32.opt_type == "adamw"
    opt32, opt16 = make_optimizer(cfg32), make_optimizer(cfg16)

    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.standard_normal((16, 8), np.float32)),
              "b": jnp.asarray(rng.standard_normal((8,), np.float32))}
    tgt = jax.tree.map(lambda p: p * 0.5 + 0.1, params)

    def grads(p):
        return jax.grad(lambda q: sum(jnp.sum((a - b) ** 2) for a, b in zip(
            jax.tree.leaves(q), jax.tree.leaves(tgt))))(p)

    s32, s16 = opt32.init(params), opt16.init(params)
    assert (jax.tree_util.tree_structure(s32)
            == jax.tree_util.tree_structure(s16))
    adam16 = s16[0]
    assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(adam16.mu))
    assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(adam16.nu))

    p32, p16 = params, params
    for _ in range(25):
        g32, g16 = grads(p32), grads(p16)
        u32, s32 = opt32.update(g32, s32, p32)
        u16, s16 = opt16.update(g16, s16, p16)
        p32 = optax.apply_updates(p32, u32)
        p16 = optax.apply_updates(p16, u16)

    for a, b in zip(jax.tree.leaves(p32), jax.tree.leaves(p16)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        # 25 steps of lr=2e-4 Adam move each param ~5e-3; bf16 moment rounding
        # perturbs each step by <=0.8%, so the trajectories stay within ~1e-4
        assert float(np.abs(a - b).max()) <= 2e-4
