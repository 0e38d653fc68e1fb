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
