"""Oracle parity of the expression pull/push/stm composition against the REFERENCE
`calc_train_losses` (models/stage_1/volumetric_avatar/va_losses_and_visuals.py:457-520),
executed as a black box with stub towers. Covers:

  * the mixing-term weight schedules (pull 0.5 -> 2 -> 3, push 0.5 -> 3);
  * the negatives-ring composition and the final /num_b_negs (:480-497, :518);
  * the prod `separate_stm=True` branch over BOTH iteration parities (:500-506):
    on FEED-spliced iterations batch element 0 is pushed at fixed weight 1.5 and
    elements 1.. at weights.stm.

The reference folds stm into `push_exp`; the comparison is therefore
repo(push_exp + stm) == ref(push_exp), and repo(pull_exp) == ref(pull_exp).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import pytest

import ref_oracle

torch = pytest.importorskip("torch")

B, D = 2, 6


class _Args:
    """Reference args namespace; unset flags read as 0/False (every gate the
    contrastive path touches treats 0 as off)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __getattr__(self, name):  # only called for MISSING attributes
        return 0


def _ref_losses(vecs, *, epoch, iteration, num_b_negs, separate_stm, prev,
                mls=1, sec_every=4, stm_w=10.0):
    ref_oracle.install_full_model_stubs()
    from models.stage_1.volumetric_avatar import va_losses_and_visuals as vl

    from collections import defaultdict
    from types import SimpleNamespace

    p_cyc, m_cyc, t_emb, s_emb = (torch.tensor(v) for v in vecs)
    obj = SimpleNamespace()
    obj.weights = defaultdict(float)
    obj.weights.update({"pull_exp": 1.0, "push_exp": 1.0, "stm": stm_w})
    obj.adversarial_loss = lambda **kw: torch.zeros(())
    obj.feature_matching_loss = lambda **kw: torch.zeros(())
    obj.cosin_sim = torch.nn.CosineEmbeddingLoss(margin=0.3)
    obj.cosin_sim_2 = torch.nn.CosineEmbeddingLoss(margin=0.5, reduce=False)
    obj.cosin_sim_pos = torch.nn.CosineEmbeddingLoss(margin=0.1)
    obj.num_b_negs = num_b_negs
    obj.prev_targets = ([torch.tensor(p) for p in prev] if prev else None)
    obj.visualize = False
    obj.pred_seg = False
    obj.args = _Args(separate_stm=separate_stm, sec_dataset_every=sec_every,
                     mix_losses_start=mls, contr_losses_start=mls,
                     num_b_negs=num_b_negs)
    data_dict = {
        "fake_score_gen": [torch.zeros(B)],
        "real_feats_gen": [],
        "fake_feats_gen": [],
        "pred_cycle_exp": p_cyc,
        "mixing_cycle_exp": m_cyc,
        "target_pose_embed": t_emb,
        "source_pose_embed": s_emb,
        # consumed by the unconditional align-warp resample block (:298-304)
        "source_img": torch.zeros(B, 3, 8, 8),
        "target_img": torch.zeros(B, 3, 8, 8),
        "pred_target_img": torch.zeros(B, 3, 8, 8),
        "align_warp": torch.zeros(2 * B, 8, 8, 2),
    }
    _, losses = vl.calc_train_losses(obj, data_dict, "gen", epoch=epoch,
                                     iteration=iteration)
    return {k: float(v) for k, v in losses.items()
            if k in ("pull_exp", "push_exp")}


def _repo_losses(vecs, *, epoch, iteration, num_b_negs, separate_stm, prev,
                 mls=1, sec_every=4, stm_w=10.0, ep_len=100):
    import jax.numpy as jnp

    from emoportraits_tpu.config import tiny_config
    from emoportraits_tpu.train.step import LossTowers, gen_losses

    p_cyc, m_cyc, t_emb, s_emb = (jnp.asarray(v) for v in vecs)
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        weights=dataclasses.replace(
            cfg.weights,
            **{f.name: 0.0 for f in dataclasses.fields(cfg.weights)}),
        train=dataclasses.replace(
            cfg.train, train_epoch_len=ep_len, sec_dataset_every=sec_every,
            mix_losses_start=mls, contr_losses_start=mls,
            separate_stm=separate_stm, num_b_negs=num_b_negs))
    cfg = dataclasses.replace(
        cfg, weights=dataclasses.replace(
            cfg.weights, pull_exp=1.0, push_exp=1.0, stm=stm_w))

    towers = LossTowers(**{f: None for f in LossTowers._fields})

    def dis_apply(params, img):
        return [jnp.zeros((img.shape[0],))], [[jnp.zeros((img.shape[0], 2))]]

    out = {
        "pred_target_img": jnp.zeros((B, 8, 8, 3)),
        "pred_cycle_exp": p_cyc,
        "mixing_cycle_exp": m_cyc,
        "target_pose_embed": t_emb,
        "source_pose_embed": s_emb,
    }
    batch = {"target_img": jnp.zeros((B, 8, 8, 3)),
             "target_mask": jnp.ones((B, 8, 8, 1))}
    if prev:
        ring = jnp.asarray(np.stack(prev))
    else:
        # empty history: the reference's first-iteration list is [current];
        # a 1-deep ring plus the appended current reproduces it only for
        # num_b_negs=1, which is what this branch is used with below
        ring = jnp.zeros((1, B, D))
    losses = gen_losses(cfg, out, batch, dis_apply, None, towers, ring,
                        step_count=jnp.asarray(epoch * ep_len + iteration))[1]
    return {k: float(v) for k, v in losses.items()
            if k in ("pull_exp", "push_exp", "stm")}


def _vecs(seed=0):
    rng = np.random.default_rng(seed)
    v = [rng.standard_normal((B, D)).astype(np.float32) for _ in range(3)]
    # source expression close to the target's so the stm margin (relu(cos - .5))
    # is ACTIVE — otherwise both branches are zero and parity is vacuous
    v.append(v[2] + 0.2 * rng.standard_normal((B, D)).astype(np.float32))
    return v


@pytest.mark.parametrize("epoch", [1, 2, 3])
@pytest.mark.parametrize("iteration", [0, 1])
@pytest.mark.parametrize("separate_stm", [True, False])
def test_push_stm_parity_vs_reference(epoch, iteration, separate_stm):
    if not ref_oracle.reference_available():
        pytest.skip("reference checkout not present")
    vecs = _vecs(epoch * 10 + iteration + int(separate_stm))
    kw = dict(epoch=epoch, iteration=iteration, num_b_negs=1,
              separate_stm=separate_stm, prev=None)
    ref = _ref_losses(vecs, **kw)
    got = _repo_losses(vecs, **kw)
    assert got["pull_exp"] == pytest.approx(ref["pull_exp"], rel=2e-5, abs=1e-6)
    assert got["push_exp"] + got["stm"] == pytest.approx(
        ref["push_exp"], rel=2e-5, abs=1e-6)


def test_push_stm_parity_num_b_negs_2():
    """Two-deep negatives ring: the reference loops over [prev (detached),
    current] and divides by num_b_negs=2."""
    if not ref_oracle.reference_available():
        pytest.skip("reference checkout not present")
    rng = np.random.default_rng(7)
    vecs = _vecs(7)
    t_old = rng.standard_normal((B, D)).astype(np.float32)
    t_prev = rng.standard_normal((B, D)).astype(np.float32)
    kw = dict(epoch=2, iteration=1, num_b_negs=2, separate_stm=True,
              prev=[t_old, t_prev])
    ref = _ref_losses(vecs, **kw)
    got = _repo_losses(vecs, **kw)
    assert got["push_exp"] + got["stm"] == pytest.approx(
        ref["push_exp"], rel=2e-5, abs=1e-6)


@pytest.mark.parametrize("iteration,spliced", [(0, True), (1, False), (2, True)])
def test_separate_stm_changes_only_spliced_iterations(iteration, spliced):
    """Pure-repo check (no torch): separate_stm differs from plain stm exactly on
    the FEED-spliced parity (it % (sec_dataset_every//2) == 0)."""
    vecs = _vecs(3)
    base = _repo_losses(vecs, epoch=2, iteration=iteration, num_b_negs=1,
                        separate_stm=False, prev=None)
    sep = _repo_losses(vecs, epoch=2, iteration=iteration, num_b_negs=1,
                       separate_stm=True, prev=None)
    if spliced:
        assert sep["stm"] != pytest.approx(base["stm"], rel=1e-6)
    else:
        assert sep["stm"] == pytest.approx(base["stm"], rel=1e-5)
