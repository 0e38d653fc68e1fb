"""CLI entry point: stage-1 training on sharded clip stores.

Usage parity with the reference launcher (experiments/args.txt: torch.distributed.launch
train.py --flags): here a single JSON config drives everything and JAX's single-controller
runtime replaces the process launcher. Examples:

  python train.py --config config.json --data-root /data/voxceleb_shards \
      --second-data-root /data/feed_shards --checkpoint-dir ckpts --epochs 400

  python train.py --synthetic --tiny --epochs 1 --iters 20     # smoke run, no data
"""
from __future__ import annotations

import argparse
import tempfile


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None, help="ExperimentConfig JSON path")
    p.add_argument("--data-root", type=str, default=None)
    p.add_argument("--second-data-root", type=str, default=None,
                   help="FEED-style extreme-emotion stream (spliced every "
                        "sec_dataset_every iters)")
    p.add_argument("--third-data-root", type=str, default=None, help="MEAD stream")
    p.add_argument("--mead-every", type=int, default=6,
                   help="splice the MEAD stream every N iters (reference "
                        "mead_as_second_every, train.py:132-139)")
    p.add_argument("--stills-root", type=str, default=None,
                   help="directory of FFHQ-style identity stills used as an extra "
                        "self-reconstruction stream (reference datasets/ffhq_crops.py)")
    p.add_argument("--stills-every", type=int, default=8)
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--log-dir", type=str, default="logs")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--iters", type=int, default=None, help="iters per epoch override")
    p.add_argument("--synthetic", action="store_true",
                   help="use the built-in synthetic dataset (smoke runs)")
    p.add_argument("--tiny", action="store_true", help="tiny model config")
    args = p.parse_args()

    from emoportraits_tpu.config import ExperimentConfig, tiny_config
    from emoportraits_tpu.data.pairs import InterleavedStream, PairDataset
    from emoportraits_tpu.data.records import ShardedClipStore, make_synthetic_store
    from emoportraits_tpu.train.trainer import Trainer

    if args.config:
        cfg = ExperimentConfig.from_json(args.config)
    elif args.tiny:
        cfg = tiny_config()
    else:
        cfg = ExperimentConfig()

    import jax

    if args.synthetic or args.data_root is None:
        root = tempfile.mkdtemp(prefix="emoportraits_synth_")
        make_synthetic_store(root, num_clips=8, frames_per_clip=8,
                             image_size=cfg.train.image_size)
        args.data_root = root

    def make_stream(root, split="train"):
        store = ShardedClipStore(root, split=split)
        ds = PairDataset(store, cfg.train.image_size, augment=(split == "train"),
                         seed=cfg.train.seed,
                         process_index=jax.process_index(),
                         process_count=jax.process_count())
        # global batch = per-device batch x local devices
        return ds.batches(cfg.train.batch_size * jax.local_device_count())

    main_stream = make_stream(args.data_root)
    second = make_stream(args.second_data_root) if args.second_data_root else None
    third = make_stream(args.third_data_root) if args.third_data_root else None
    if third is None and args.stills_root:
        from emoportraits_tpu.data.stills import StillsDataset

        third = StillsDataset(args.stills_root, cfg.train.image_size).batches(
            cfg.train.batch_size * jax.local_device_count())
        args.mead_every = args.stills_every
    train_stream = InterleavedStream(
        main_stream, second, third,
        sec_dataset_every=cfg.train.sec_dataset_every if second else 0,
        mead_every=args.mead_every if third else 0)
    test_stream = make_stream(args.data_root, split="test")

    trainer = Trainer(cfg, train_stream, test_stream,
                      log_dir=args.log_dir, checkpoint_dir=args.checkpoint_dir)
    trainer.fit(epochs=args.epochs, iters_per_epoch=args.iters)


if __name__ == "__main__":
    main()
