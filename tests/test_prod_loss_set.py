"""Gate tests: the jitted train step carries EVERY nonzero-prod-weight loss.

The production run (reference experiments/args.txt) trains with adversarial(1) +
feature_matching(40) + vgg19(18) + vgg19_face(10) + gaze(10) + resnet18_fv_mix(35) +
pull/push(1) + stm(10) + contrastive_exp(2) + eyes/mouth/ears L1(500 each) +
volumes_l1(0.5). Assembly: va_losses_and_visuals.py:22-633. These tests fail if any of
them silently drops out of train/step.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emoportraits_tpu.config import tiny_config
from emoportraits_tpu.models.discriminator import MultiScaleDiscriminator
from emoportraits_tpu.models.stage1 import VolumetricAvatar
from emoportraits_tpu.train.forward import make_gen_apply
from emoportraits_tpu.train.state import TrainState
from emoportraits_tpu.train.step import make_train_step
from emoportraits_tpu.train.towers import build_loss_towers

# compile-heavy e2e: excluded from the quick loop via `-m "not slow"`
pytestmark = pytest.mark.slow

PROD_LOSSES = (
    "gen/gen_adversarial", "gen/feature_matching", "gen/vgg19", "gen/vgg19_face",
    "gen/gaze", "gen/resnet18_fv_mix", "gen/pull_exp", "gen/push_exp", "gen/stm",
    "gen/contrastive_exp_pred", "gen/contrastive_exp_mix",
    "gen/eyes_l1", "gen/mouth_l1", "gen/ears_l1", "gen/volumes_l1",
    "dis/adversarial",
)


@pytest.fixture(scope="module")
def step_run():
    cfg = tiny_config()
    key = jax.random.PRNGKey(0)
    model = VolumetricAvatar(cfg.model)
    dis = MultiScaleDiscriminator(cfg.model.discriminator)

    b, s = 2, cfg.train.image_size
    rng = np.random.default_rng(0)
    batch = {
        "source_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "target_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "source_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_keypoints": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 68, 2)).astype(np.float32)),
    }
    theta = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    gen_vars = model.init(key, batch["source_img"], batch["source_mask"],
                          batch["target_img"], theta, theta)
    dis_vars = dis.init(key, batch["target_img"])
    towers, frozen = build_loss_towers(cfg, key, tiny=True)
    gen_apply = make_gen_apply(cfg, model, towers.head_pose_apply,
                               towers.head_pose_params,
                               face_parsing=frozen.face_parsing,
                               matting=frozen.matting)
    state = TrainState.create(cfg, gen_vars, dis_vars, batch_size=b)
    step = jax.jit(make_train_step(
        cfg, gen_apply, lambda v, img: dis.apply(v, img), towers))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    out, new_sn = gen_apply({"params": state.gen_params,
                             "sn_state": state.gen_sn_state}, batch,
                            jax.random.PRNGKey(1))
    return cfg, model, state, new_state, metrics, out, batch, towers, new_sn


def test_all_prod_losses_present(step_run):
    metrics = step_run[4]
    missing = [k for k in PROD_LOSSES if k not in metrics]
    assert not missing, f"prod losses absent from the train step: {missing}"


def test_prod_losses_finite_and_active(step_run):
    metrics = step_run[4]
    for k in PROD_LOSSES:
        v = float(metrics[k])
        assert np.isfinite(v), f"{k} not finite: {v}"
    # the big-weight face-part L1s and the frozen-tower losses must actually fire
    # (nonzero on a random batch), not just exist as keys
    for k in ("gen/eyes_l1", "gen/mouth_l1", "gen/ears_l1", "gen/gaze",
              "gen/resnet18_fv_mix", "gen/vgg19_face"):
        assert abs(float(metrics[k])) > 0, f"{k} is exactly zero on a random batch"


def test_part_masks_are_soft_and_normalized(step_run):
    from emoportraits_tpu.models.face_parsing import soft_part_masks

    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 19))
    masks = soft_part_masks(logits)
    for name in ("eyes", "mouth", "ears"):
        m = masks[name]
        assert m.shape == (2, 16, 16, 1)
        assert float(jnp.min(m)) >= 0.0 and float(jnp.max(m)) <= 1.0


def test_mixing_cycle_exp_is_rolled_for_pairing(step_run):
    """mixing sample i is driven by target i-1's expression (roll +1 in generate);
    the cycle embedding must be rolled -1 so element i pairs with target i
    (reference va.py:716-721 rolls pred_mixing_img by -1 before re-embedding).
    Verifies the ACTUAL wiring: out['mixing_cycle_exp'] == roll(embed(mix_img), -1).
    The re-embed must use the POST-forward sn_state (gen_apply runs its cycle embeds
    after the main apply's power iteration updated the SN u/v vectors)."""
    cfg, model, state, new_state, metrics, out, batch, towers, new_sn = step_run
    frozen = {"params": state.gen_params, "sn_state": new_sn}
    mix = out["pred_mixing_img"]
    mix_theta = towers.head_pose_apply(towers.head_pose_params, mix)
    emb = model.apply(frozen, mix, mix_theta, method=model.expression_vector)
    np.testing.assert_allclose(np.asarray(out["mixing_cycle_exp"]),
                               np.asarray(jnp.roll(emb, -1, axis=0)),
                               rtol=1e-4, atol=1e-5)


def test_mask_refinement_and_matting_outputs(step_run):
    cfg, model, state, new_state, metrics, out, batch, towers, _ = step_run
    assert "refined_target_mask" in out and "refined_source_mask" in out
    assert out["refined_target_mask"].shape == batch["target_mask"].shape
    # refinement can only shrink the dataset matte (logical AND)
    assert float(jnp.max(out["refined_target_mask"] - batch["target_mask"])) <= 1e-6
    # matting of the mixing image
    assert "pred_mixing_mask" in out
    a = out["pred_mixing_mask"]
    assert a.shape == out["pred_mixing_img"].shape[:3] + (1,)
    assert float(jnp.min(a)) >= 0.0 and float(jnp.max(a)) <= 1.0
    # aligned crops for vgg19_face / fv_mix
    gs = cfg.model.expression_embedder.image_size // 2
    assert out["mixing_img_align"].shape[1:3] == (gs, gs)
    assert out["target_img_align_orig"].shape[1:3] == (gs, gs)


def test_ibug_mask_refinement(step_run):
    """use_ibug_mask=True switches the refinement to the ibug-branch arithmetic
    (va.py:324-349): FACE+hat labels + lower-half-zeroed matte, threshold 0.6."""
    import dataclasses

    cfg, model, state, *_ = step_run
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train,
                                                             use_ibug_mask=True))
    towers, frozen = build_loss_towers(cfg, jax.random.PRNGKey(0), tiny=True)
    gen_apply = make_gen_apply(cfg, model, towers.head_pose_apply,
                               towers.head_pose_params,
                               face_parsing=frozen.face_parsing,
                               matting=frozen.matting)
    rng = np.random.default_rng(13)
    b, s = 2, cfg.train.image_size
    batch = {
        "source_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "target_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "source_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_mask": jnp.ones((b, s, s, 1), jnp.float32),
    }
    out, _ = gen_apply({"params": state.gen_params,
                        "sn_state": state.gen_sn_state}, batch,
                       jax.random.PRNGKey(2))
    m = np.asarray(out["refined_target_mask"])
    assert m.shape == (b, s, s, 1)
    assert set(np.unique(m)).issubset({0.0, 1.0})  # hard threshold
    assert m.max() <= 1.0 and (m <= np.asarray(batch["target_mask"])).all()


def test_binary_face_mask_refinement_semantics():
    """Labels outside MASK_LABELS (e.g. background=0) zero the mask; labels inside
    keep it (reference va.py:352-361 threshold-0.6 binary AND)."""
    from emoportraits_tpu.models.face_parsing import binary_face_mask

    logits = np.zeros((1, 4, 4, 19), np.float32)
    logits[:, :2] = np.eye(19)[0] * 10    # top half: background
    logits[:, 2:] = np.eye(19)[1] * 10    # bottom half: skin (label 1)
    m = binary_face_mask(jnp.asarray(logits))
    assert float(m[0, 0, 0, 0]) == 0.0
    assert float(m[0, 3, 0, 0]) == 1.0


def test_keypoint_aligned_canon_from_target(step_run):
    """With 3D landmarks in the batch, the canon-from-target rotation is refined by
    the Umeyama alignment of de-posed landmarks (reference va.py:437-448) and the
    nose-template outputs appear (va.py:389-409)."""
    cfg, model, state, *_ , towers, _new_sn = step_run
    rng = np.random.default_rng(3)
    b, s = 2, cfg.train.image_size
    batch = {
        "source_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "target_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "source_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "source_keypoints": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 68, 3)).astype(np.float32)),
        "target_keypoints": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 68, 3)).astype(np.float32)),
    }
    _, frozen = build_loss_towers(cfg, jax.random.PRNGKey(0), tiny=True)
    gen_apply = make_gen_apply(cfg, model, towers.head_pose_apply,
                               towers.head_pose_params,
                               face_parsing=frozen.face_parsing,
                               matting=frozen.matting)
    out, _ = gen_apply({"params": state.gen_params,
                        "sn_state": state.gen_sn_state}, batch,
                       jax.random.PRNGKey(2))
    assert "source_warped_keypoints_n" in out
    assert out["source_warped_keypoints_n"].shape == (b, 68, 3)
    assert np.isfinite(np.asarray(out["source_warped_keypoints_n"])).all()
    assert np.isfinite(np.asarray(out["canon_volume_from_target"])).all()


def test_second_dis_and_stylegan_d_step():
    """use_mix_dis + use_stylegan_d: the optional discriminators train inside the
    jitted step (reference va.py:238-247 construction, :999-1046 D passes,
    va_losses_and_visuals.py:33-58 loss assembly)."""
    import dataclasses

    from emoportraits_tpu.models.stylegan2_d import DiscriminatorStyleGAN2

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, use_mix_dis=True,
            discriminator2=cfg.model.discriminator,
            stylegan_d=dataclasses.replace(cfg.model.stylegan_d,
                                           size=cfg.train.image_size)),
        train=dataclasses.replace(cfg.train, use_stylegan_d=True, d_reg_every=2))
    key = jax.random.PRNGKey(0)
    model = VolumetricAvatar(cfg.model)
    dis = MultiScaleDiscriminator(cfg.model.discriminator)
    dis2 = MultiScaleDiscriminator(cfg.model.discriminator2)
    sg = DiscriminatorStyleGAN2(cfg.model.stylegan_d)

    b, s = 2, cfg.train.image_size
    rng = np.random.default_rng(7)
    batch = {
        "source_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "target_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "source_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_keypoints": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 68, 2)).astype(np.float32)),
    }
    theta = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    gen_vars = model.init(key, batch["source_img"], batch["source_mask"],
                          batch["target_img"], theta, theta)
    dis_vars = dis.init(key, batch["target_img"])
    dis2_vars = dis2.init(jax.random.fold_in(key, 2), batch["target_img"])
    sg_vars = sg.init(jax.random.fold_in(key, 3), batch["target_img"])
    towers, frozen = build_loss_towers(cfg, key, tiny=True)
    gen_apply = make_gen_apply(cfg, model, towers.head_pose_apply,
                               towers.head_pose_params,
                               face_parsing=frozen.face_parsing,
                               matting=frozen.matting)
    state = TrainState.create(cfg, gen_vars, dis_vars, batch_size=b,
                              dis2_variables=dis2_vars, sg_variables=sg_vars)
    step = jax.jit(make_train_step(
        cfg, gen_apply, lambda v, img: dis.apply(v, img), towers,
        dis2_apply_raw=lambda v, img: dis2.apply(v, img),
        sg_apply_raw=lambda v, img: sg.apply(v, img)))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k in ("gen/gen_adversarial_mix", "gen/g_style",
              "dis/adversarial_mix", "dis/style"):
        assert k in metrics, f"{k} missing"
        assert np.isfinite(float(metrics[k])), f"{k} not finite"
    # both optional discriminators actually stepped
    d2_delta = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b_: a - b_, new_state.dis2_params,
                     state.dis2_params), 0.0)
    sg_delta = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b_: a - b_, new_state.sg_params, state.sg_params), 0.0)
    assert d2_delta > 0 and sg_delta > 0


def test_landmarks_loss_in_step():
    """Optional 'landmarks' loss (w=0 in prod; va_losses_and_visuals.py:405-428):
    with a nonzero weight the step crops the face box from target keypoints and
    runs the frozen MobileFaceNet tap L1."""
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, weights=dataclasses.replace(cfg.weights, landmarks=20.0))
    key = jax.random.PRNGKey(0)
    model = VolumetricAvatar(cfg.model)
    dis = MultiScaleDiscriminator(cfg.model.discriminator)
    b, s = 2, cfg.train.image_size
    rng = np.random.default_rng(3)
    batch = {
        "source_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "target_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "source_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_keypoints": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 68, 2)).astype(np.float32)),
    }
    theta = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    gen_vars = model.init(key, batch["source_img"], batch["source_mask"],
                          batch["target_img"], theta, theta)
    dis_vars = dis.init(key, batch["target_img"])
    towers, frozen = build_loss_towers(cfg, key, tiny=True)
    assert towers.landmark_apply is not None
    gen_apply = make_gen_apply(cfg, model, towers.head_pose_apply,
                               towers.head_pose_params,
                               face_parsing=frozen.face_parsing,
                               matting=frozen.matting)
    state = TrainState.create(cfg, gen_vars, dis_vars, batch_size=b)
    step = jax.jit(make_train_step(
        cfg, gen_apply, lambda v, img: dis.apply(v, img), towers))
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert "gen/landmarks" in metrics
    assert np.isfinite(float(metrics["gen/landmarks"]))
    assert float(metrics["gen/landmarks"]) > 0


def test_emotion_family_losses_in_step():
    """Optional emotion/identity losses (all 0 in prod;
    va_losses_and_visuals.py:356-403): face_resnet SENet taps, grayscale
    vgg19_emotions, resnet18_emotions, and vgg19_fv_mix on the aligned crops."""
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, weights=dataclasses.replace(
            cfg.weights, face_resnet=2.0, vgg19_emotions=3.0,
            resnet18_emotions=4.0, vgg19_fv_mix=5.0))
    key = jax.random.PRNGKey(0)
    model = VolumetricAvatar(cfg.model)
    dis = MultiScaleDiscriminator(cfg.model.discriminator)
    b, s = 2, cfg.train.image_size
    rng = np.random.default_rng(5)
    batch = {
        "source_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "target_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "source_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_keypoints": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 68, 2)).astype(np.float32)),
    }
    theta = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    gen_vars = model.init(key, batch["source_img"], batch["source_mask"],
                          batch["target_img"], theta, theta)
    dis_vars = dis.init(key, batch["target_img"])
    towers, frozen = build_loss_towers(cfg, key, tiny=True)
    assert towers.face_resnet_apply is not None
    assert towers.emotion_vgg_apply is not None
    assert towers.emotion_resnet_apply is not None
    gen_apply = make_gen_apply(cfg, model, towers.head_pose_apply,
                               towers.head_pose_params,
                               face_parsing=frozen.face_parsing,
                               matting=frozen.matting)
    state = TrainState.create(cfg, gen_vars, dis_vars, batch_size=b)
    step = jax.jit(make_train_step(
        cfg, gen_apply, lambda v, img: dis.apply(v, img), towers))
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k in ("gen/face_resnet", "gen/vgg19_emotions", "gen/resnet18_emotions",
              "gen/vgg19_fv_mix"):
        assert k in metrics, f"{k} missing"
        assert np.isfinite(float(metrics[k])), f"{k} not finite"
    for k in ("gen/face_resnet", "gen/vgg19_emotions", "gen/resnet18_emotions"):
        assert float(metrics[k]) > 0, f"{k} inactive"


def test_cycle_barlow_volumes_extras_in_step():
    """Remaining optional losses in one compiled step: barlow twins, canonical-
    volume pull/push, warping_reg, perc_face_pars, and the pred_cycle branch's
    cycle_exp/cycle_idn perceptual families (va_losses_and_visuals.py:117-141,
    177-179, 259-295, 430-455)."""
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        weights=dataclasses.replace(
            cfg.weights, barlow=1.0, volumes_pull=2.0, volumes_push=2.0,
            warping_reg=1.0, perc_face_pars=3.0, cycle_exp=1.0, cycle_idn=1.0,
            vgg19_cycle_exp=4.0, vgg19_face_cycle_exp=5.0,
            vgg19_cycle_idn=6.0, vgg19_face_cycle_idn=7.0,
            contrastive_idt=1.0),
        train=dataclasses.replace(cfg.train, pred_cycle=True))
    key = jax.random.PRNGKey(0)
    model = VolumetricAvatar(cfg.model)
    dis = MultiScaleDiscriminator(cfg.model.discriminator)
    b, s = 2, cfg.train.image_size
    rng = np.random.default_rng(9)
    batch = {
        "source_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "target_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "source_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "source_keypoints": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 68, 3)).astype(np.float32)),
        "target_keypoints": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 68, 3)).astype(np.float32)),
    }
    theta = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    gen_vars = model.init(key, batch["source_img"], batch["source_mask"],
                          batch["target_img"], theta, theta)
    dis_vars = dis.init(key, batch["target_img"])
    towers, frozen = build_loss_towers(cfg, key, tiny=True)
    assert towers.face_pars_feats_apply is not None
    gen_apply = make_gen_apply(cfg, model, towers.head_pose_apply,
                               towers.head_pose_params,
                               face_parsing=frozen.face_parsing,
                               matting=frozen.matting)
    state = TrainState.create(cfg, gen_vars, dis_vars, batch_size=b)
    step = jax.jit(make_train_step(
        cfg, gen_apply, lambda v, img: dis.apply(v, img), towers))
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k in ("gen/barlow", "gen/volumes_pull", "gen/volumes_push",
              "gen/warping_reg", "gen/perc_face_pars", "gen/vgg19_cycle_exp",
              "gen/vgg19_face_cycle_exp", "gen/vgg19_cycle_idn",
              "gen/vgg19_face_cycle_idn", "gen/contrastive_idt_tar",
              "gen/contrastive_idt_pred", "gen/contrastive_idt_mix"):
        assert k in metrics, f"{k} missing"
        assert np.isfinite(float(metrics[k])), f"{k} not finite"
    for k in ("gen/barlow", "gen/warping_reg", "gen/perc_face_pars",
              "gen/vgg19_cycle_exp", "gen/vgg19_cycle_idn"):
        assert abs(float(metrics[k])) > 0, f"{k} inactive"


def test_thetas_pool_ring_updates(step_run):
    """prod random_theta (va.py:650, non_specific.py:137-152): the train step keeps
    a ring of past target-theta batches in TrainState and samples the mixing pose
    from it with prob 0.5. After one step the first slot holds the batch's target
    thetas (nonzero) and the fill count is 1; later slots stay empty."""
    cfg, model, state, new_state, metrics, out, batch, towers, _ = step_run
    assert cfg.train.random_theta
    assert state.thetas_pool is not None
    assert state.thetas_pool.shape == (cfg.train.thetas_pool_size, 2, 3, 4)
    assert int(new_state.thetas_pool_count) == 1
    assert float(jnp.abs(new_state.thetas_pool[0]).sum()) > 0
    assert float(jnp.abs(new_state.thetas_pool[1]).sum()) == 0


def test_volumes_l1_fires_when_ungated(step_run):
    """tiny_config disables the vol_loss_epoch gate, so volumes_l1 must be live at
    step 0 (the gated-to-zero case rides test_epoch_gates_delay_heavy_losses)."""
    metrics = step_run[4]
    assert abs(float(metrics["gen/volumes_l1"])) > 0


def test_epoch_gates_delay_heavy_losses(step_run):
    """The reference delays the heavy losses by epoch (face parts wait
    face_parts_epoch_start, fv_mix waits mix_losses_start, the contrastive family
    waits contr_losses_start — va_losses_and_visuals.py:182,325,458). At step 0 with
    nonzero gates those losses must be exactly zero; the always-on losses stay live."""
    import dataclasses

    cfg, model, state, new_state, metrics, out, batch, towers, _ = step_run
    gated_cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, face_parts_epoch_start=10,
                                       mix_losses_start=1, contr_losses_start=1,
                                       vol_loss_epoch=10, vol_loss_iter_start=20))
    gen_apply = make_gen_apply(gated_cfg, model, towers.head_pose_apply,
                               towers.head_pose_params)
    dis = MultiScaleDiscriminator(gated_cfg.model.discriminator)
    step = jax.jit(make_train_step(
        gated_cfg, gen_apply, lambda v, img: dis.apply(v, img), towers))
    _, m = step(state, batch, jax.random.PRNGKey(1))
    for k in ("gen/eyes_l1", "gen/mouth_l1", "gen/ears_l1", "gen/resnet18_fv_mix",
              "gen/pull_exp", "gen/push_exp", "gen/stm",
              "gen/contrastive_exp_pred", "gen/volumes_l1"):
        assert float(m[k]) == 0.0, f"{k} should be epoch-gated to zero at step 0"
    for k in ("gen/gen_adversarial", "gen/vgg19", "gen/feature_matching"):
        assert abs(float(m[k])) > 0, f"{k} must stay active at step 0"


def test_volume_rendering_branch_and_losses():
    """volume_rendering=True: the EG3D renderer replaces the collapse on the decoder
    input (va.py:586-589), emits pred_tar_img_vol/depth + mixing variants, and the
    l1_vol_rgb losses fire (va_losses_and_visuals.py:245-256)."""
    import dataclasses

    cfg = tiny_config()
    vr = dataclasses.replace(cfg.model.volume_renderer, depth_resolution=8,
                             depth_resolution_importance=8, hidden_dim=16,
                             features=8, squeeze_dim=8)
    # decoder input channels = renderer feature dim (features * 4)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, volume_rendering=True, volume_renderer=vr,
            decoder=dataclasses.replace(cfg.model.decoder, in_channels=vr.features * 4)),
        weights=dataclasses.replace(cfg.weights, l1_vol_rgb=1.0, l1_vol_rgb_mix=1.0,
                                    targ_vol_loss_scale=1.0))
    key = jax.random.PRNGKey(0)
    model = VolumetricAvatar(cfg.model)
    dis = MultiScaleDiscriminator(cfg.model.discriminator)
    b, s = 2, cfg.train.image_size
    rng = np.random.default_rng(11)
    batch = {
        "source_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "target_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "source_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_keypoints": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 68, 2)).astype(np.float32)),
    }
    theta = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    gen_vars = model.init(key, batch["source_img"], batch["source_mask"],
                          batch["target_img"], theta, theta)
    dis_vars = dis.init(key, batch["target_img"])
    towers, frozen = build_loss_towers(cfg, key, tiny=True)
    gen_apply = make_gen_apply(cfg, model, towers.head_pose_apply,
                               towers.head_pose_params,
                               face_parsing=frozen.face_parsing,
                               matting=frozen.matting)
    state = TrainState.create(cfg, gen_vars, dis_vars, batch_size=b)
    step = jax.jit(make_train_step(
        cfg, gen_apply, lambda v, img: dis.apply(v, img), towers))
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k in ("gen/l1_vol_rgb", "gen/l1_vol_rgb_tar", "gen/l1_vol_rgb_mix"):
        assert k in metrics and np.isfinite(float(metrics[k])), k


def test_ema_params_update():
    cfg = tiny_config()
    import dataclasses

    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train,
                                                             ema_decay=0.5))
    from emoportraits_tpu.utils.ema import ema_init, ema_update

    params = {"w": jnp.ones((2, 2))}
    ema = ema_init(params)
    new = ema_update(ema, {"w": jnp.zeros((2, 2))}, cfg.train.ema_decay)
    np.testing.assert_allclose(np.asarray(new["w"]), 0.5)


def test_grad_check_per_loss_norms(step_run):
    """check_grads_of_every_loss role (reference train.py:59,407-409): the grad-check
    diagnostic reports a positive finite parameter-grad norm per requested loss from
    ONE shared forward, plus the reference's literal retained d(total)/d(source_img)."""
    from emoportraits_tpu.train.grad_check import make_grad_check

    cfg, model, state, new_state, metrics, out, batch, towers, _ = step_run
    gen_apply = make_gen_apply(cfg, model, towers.head_pose_apply,
                               towers.head_pose_params)
    dis = MultiScaleDiscriminator(cfg.model.discriminator)
    check = jax.jit(make_grad_check(
        cfg, gen_apply, lambda v, img: dis.apply(v, img), towers,
        keys=("total", "vgg19", "gen_adversarial")))
    report = check(state, batch, jax.random.PRNGKey(2))
    assert set(report) == {"total", "vgg19", "gen_adversarial",
                           "d(total)/d(source_img)"}
    for k, v in report.items():
        v = float(v)
        assert np.isfinite(v) and v > 0, f"{k}: {v}"
    # total bounds any single component's grad contribution only in direction, not
    # norm — but vgg19 alone must not exceed the total by orders of magnitude
    assert float(report["vgg19"]) < 1e4 * float(report["total"])


def test_training_dynamics_losses_decrease():
    """Training-dynamics gate (the reference validates dynamics only by watching W&B
    curves on real runs): 60 repeated prod-loss GAN steps on one fixed batch must
    (a) stay finite throughout and (b) drive the reconstruction terms down — the
    generator memorizes the pair, so vgg19 + the pixel part-L1 sum at the end must
    fall meaningfully below their initial values. The adversarial terms are excluded
    (two-player, non-monotone by design). Uses 10x the prod lr so 60 steps carry a
    measurable signal (prod 2e-4 moves these losses ~0.5% in that budget)."""
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        gen_opt=dataclasses.replace(cfg.gen_opt, lr=2e-3, shd_lr_min=2e-3),
        dis_opt=dataclasses.replace(cfg.dis_opt, lr=2e-3, shd_lr_min=2e-3))
    key = jax.random.PRNGKey(0)
    model = VolumetricAvatar(cfg.model)
    dis = MultiScaleDiscriminator(cfg.model.discriminator)
    b, s = 2, cfg.train.image_size
    rng = np.random.default_rng(0)
    batch = {
        "source_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "target_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "source_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_keypoints": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 68, 2)).astype(np.float32)),
    }
    theta = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    gen_vars = model.init(key, batch["source_img"], batch["source_mask"],
                          batch["target_img"], theta, theta)
    dis_vars = dis.init(key, batch["target_img"])
    towers, frozen = build_loss_towers(cfg, key, tiny=True)
    gen_apply = make_gen_apply(cfg, model, towers.head_pose_apply,
                               towers.head_pose_params,
                               face_parsing=frozen.face_parsing,
                               matting=frozen.matting)
    state = TrainState.create(cfg, gen_vars, dis_vars, batch_size=b)
    step = jax.jit(make_train_step(
        cfg, gen_apply, lambda v, img: dis.apply(v, img), towers))

    def recon(m):
        return (float(m["gen/vgg19"])
                + float(m["gen/eyes_l1"]) + float(m["gen/mouth_l1"])
                + float(m["gen/ears_l1"]))

    history = []
    st = state
    for i in range(60):
        st, m = step(st, batch, jax.random.fold_in(jax.random.PRNGKey(7), i))
        assert np.isfinite(float(m["gen/total"])), f"step {i} diverged"
        history.append(recon(m))
    first, last = np.mean(history[:3]), np.mean(history[-3:])
    assert last < first, (
        f"reconstruction losses did not decrease: {first:.4f} -> {last:.4f}\n"
        f"curve: {[round(h, 3) for h in history]}")
    # and meaningfully so: at least 2% off the initial value after 60 steps
    assert last < 0.98 * first, (
        f"too-weak training signal: {first:.4f} -> {last:.4f}\n"
        f"curve: {[round(h, 3) for h in history]}")


def test_bf16_towers_metric_equivalence():
    """bf16 frozen-tower weights (train.bf16_towers / bench default) keep every
    prod loss finite and within a few percent of the fp32-tower values — the
    correctness basis for serving the evaluators in bf16 on the MXU."""
    import numpy as np

    from emoportraits_tpu.config import tiny_config
    from emoportraits_tpu.models.discriminator import MultiScaleDiscriminator
    from emoportraits_tpu.models.stage1 import VolumetricAvatar
    from emoportraits_tpu.train.forward import make_gen_apply
    from emoportraits_tpu.train.state import TrainState
    from emoportraits_tpu.train.step import (
        cast_tower_params_bf16,
        make_train_step,
        tower_params_pytree,
    )
    from emoportraits_tpu.train.towers import build_loss_towers

    cfg = tiny_config()
    key = jax.random.PRNGKey(0)
    model = VolumetricAvatar(cfg.model)
    dis = MultiScaleDiscriminator(cfg.model.discriminator)
    b, s = 2, cfg.train.image_size
    rng = np.random.default_rng(0)
    batch = {
        "source_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "target_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "source_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_keypoints": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 68, 2)).astype(np.float32)),
    }
    theta = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    gen_vars = model.init(key, batch["source_img"], batch["source_mask"],
                          batch["target_img"], theta, theta)
    dis_vars = dis.init(key, batch["target_img"])
    towers, frozen = build_loss_towers(cfg, key, tiny=True)
    gen_apply = make_gen_apply(cfg, model, towers.head_pose_apply,
                               towers.head_pose_params,
                               face_parsing=frozen.face_parsing,
                               matting=frozen.matting)
    step = jax.jit(make_train_step(cfg, gen_apply,
                                   lambda v, img: dis.apply(v, img), towers))
    tp = tower_params_pytree(towers, frozen)
    tp_bf16 = cast_tower_params_bf16(tp)
    # head-pose must stay fp32
    assert jax.tree.leaves(tp_bf16["head_pose_params"])[0].dtype == jnp.float32
    assert any(leaf.dtype == jnp.bfloat16
               for leaf in jax.tree.leaves(tp_bf16["vgg19_params"]))

    state = TrainState.create(cfg, gen_vars, dis_vars, batch_size=b)
    _, m32 = step(state, batch, jax.random.PRNGKey(1), tp)
    _, m16 = step(state, batch, jax.random.PRNGKey(1), tp_bf16)
    for k in m32:
        a, bb = float(m32[k]), float(m16[k])
        assert np.isfinite(bb), k
        denom = max(abs(a), 1e-3)
        # the contrastive family exponentiates cosine similarities of embeds of
        # GENERATED images seen through the (bf16) matting mask — with tiny random
        # towers that amplifies rounding; reconstruction/feature losses stay tight
        tol = 0.25 if "contrastive" in k else 0.08
        assert abs(a - bb) / denom < tol, (k, a, bb)
