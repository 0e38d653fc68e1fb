"""End-to-end Trainer smoke test: synthetic data -> a few sharded train steps on the
8-device CPU mesh -> eval metrics -> checkpoint save/restore round-trip."""
import numpy as np
import pytest

import jax

from emoportraits_tpu.config import tiny_config
from emoportraits_tpu.data.pairs import PairDataset
from emoportraits_tpu.data.records import ShardedClipStore, make_synthetic_store
from emoportraits_tpu.train.trainer import Trainer


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path):
    cfg = tiny_config()
    root = str(tmp_path / "data")
    make_synthetic_store(root, num_clips=6, frames_per_clip=4, image_size=64)
    n_dev = jax.local_device_count()

    def stream(split):
        store = ShardedClipStore(root, split=split)
        ds = PairDataset(store, 64, augment=False, seed=0)
        return ds.batches(cfg.train.batch_size * n_dev)

    trainer = Trainer(cfg, stream("train"), stream("test"),
                      log_dir=str(tmp_path / "logs"),
                      checkpoint_dir=str(tmp_path / "ckpt"))
    trainer.train_epoch(num_iters=2)
    assert int(trainer.state.step) == 2

    metrics = trainer.evaluate(num_batches=1)
    assert np.isfinite(metrics["test/ssim"]) and np.isfinite(metrics["test/psnr"])

    trainer.ckpt.save(int(trainer.state.step), trainer.state)
    trainer.ckpt.wait()
    restored = trainer.ckpt.restore(trainer.state)
    assert int(restored.step) == 2


@pytest.mark.slow
def test_resume_equivalence_end_to_end(tmp_path):
    """Preemption/resume is LOSSLESS: 2 steps -> checkpoint -> a FRESH Trainer
    auto-restores -> 2 more steps lands bit-identically where an uninterrupted
    4-step run (same epoch chunking) lands. Catches any TrainState leaf that the
    checkpoint drops (opt moments, EMA, sn_state, BN stats, negatives ring,
    thetas pool) and any rng/iteration drift on the resume path — a stronger
    gate than the state round-trip above (reference manual-resume parity,
    train.py:150-171)."""
    import dataclasses

    cfg = tiny_config()
    # 2-device mesh: three Trainers' worth of 8-way collectives starve the
    # single host core past XLA's rendezvous hard-abort; 2-way still exercises
    # the full sharded resume path
    cfg = dataclasses.replace(
        cfg, parallel=dataclasses.replace(cfg.parallel, num_devices=2))
    root = str(tmp_path / "data")
    make_synthetic_store(root, num_clips=6, frames_per_clip=4, image_size=64)
    n_dev = 2
    store = ShardedClipStore(root, split="train")
    ds = PairDataset(store, 64, augment=False, seed=0)
    it = ds.batches(cfg.train.batch_size * n_dev)
    batches = [next(it) for _ in range(4)]

    def leaves(state):
        return jax.tree_util.tree_leaves(
            (state.gen_params, state.dis_params, state.gen_opt_state,
             state.dis_opt_state, state.ema_params, state.gen_sn_state,
             state.dis_sn_state, state.prev_targets, state.thetas_pool,
             state.thetas_pool_count, state.step))

    # uninterrupted run, chunked at the same epoch boundary as the resumed one
    tr_a = Trainer(cfg, iter(batches), log_dir=str(tmp_path / "logs_a"))
    tr_a.train_epoch(num_iters=2)
    tr_a.train_epoch(num_iters=2)

    # interrupted run: 2 steps, checkpoint, FRESH trainer restores, 2 steps
    tr_b = Trainer(cfg, iter(batches), log_dir=str(tmp_path / "logs_b"),
                   checkpoint_dir=str(tmp_path / "ckpt"))
    tr_b.train_epoch(num_iters=2)
    tr_b.ckpt.save(int(tr_b.state.step), tr_b.state)
    tr_b.ckpt.wait()
    del tr_b

    tr_c = Trainer(cfg, iter(batches[2:]), log_dir=str(tmp_path / "logs_c"),
                   checkpoint_dir=str(tmp_path / "ckpt"))
    assert int(tr_c.state.step) == 2          # auto-restored on construction
    assert tr_c.logger.iteration == 2
    tr_c.train_epoch(num_iters=2)

    got, want = leaves(tr_c.state), leaves(tr_a.state)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
