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
    p.add_argument("--stage2", action="store_true",
                   help="train the stage-2 512px enhancer on frozen stage-1 outputs "
                        "(reference models/stage_2, volumetric_avatar_two.py)")
    p.add_argument("--stage1-checkpoint", type=str, default=None,
                   help="orbax checkpoint dir of the frozen stage-1 model (--stage2)")
    p.add_argument("--fsdp", action="store_true",
                   help="shard params+optimizer state over the data mesh "
                        "(ZeRO-3 semantics; default: replicated DP)")
    p.add_argument("--ref-args", type=str, default=None,
                   help="build the config from a reference args.txt snapshot")
    p.add_argument("--towers-dir", type=str, default=None,
                   help="directory of ported frozen-tower .npz files from "
                        "`python -m emoportraits_tpu.port.cli <tower> ...` "
                        "(head_pose.npz, face_parsing.npz, modnet.npz, gaze.npz, ...)")
    p.add_argument("--strict-towers", action="store_true",
                   help="fail unless every frozen tower runs ported real weights "
                        "(provenance surfaced at startup either way)")
    args = p.parse_args()

    from emoportraits_tpu.config import ExperimentConfig, tiny_config
    from emoportraits_tpu.data.pairs import (
        InterleavedStream,
        PairDataset,
        Prefetcher,
    )
    from emoportraits_tpu.data.records import ShardedClipStore, make_synthetic_store
    from emoportraits_tpu.train.trainer import Trainer

    if args.config:
        cfg = ExperimentConfig.from_json(args.config)
    elif args.ref_args:
        from emoportraits_tpu.config import from_reference_args

        cfg, unknown = from_reference_args(args.ref_args)
        if unknown:
            print(f"ref-args: {len(unknown)} flags without a counterpart "
                  f"(e.g. {sorted(unknown)[:5]})")
    elif args.tiny:
        cfg = tiny_config()
    else:
        cfg = ExperimentConfig()
    if args.fsdp:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, parallel=dataclasses.replace(cfg.parallel, fsdp=True))

    import jax

    if args.synthetic or args.data_root is None:
        root = tempfile.mkdtemp(prefix="emoportraits_synth_")
        make_synthetic_store(root, num_clips=8, frames_per_clip=8,
                             image_size=cfg.train.image_size,
                             with_geometry=args.stage2)
        args.data_root = root

    def make_stream(root, split="train"):
        # global batch = per-device batch x local devices
        gb = cfg.train.batch_size * jax.local_device_count()
        if split == "train":
            # prefer the native C++ mmap loader when an EMOS1 store exists at root
            # (native/emodata.cc; falls back to the Python reader otherwise)
            try:
                from emoportraits_tpu.data.native import NativePairLoader

                # stage-2 runs want FFHQ-aligned target crops from the stored
                # thetas (EMOS2 payload) as ground truth
                loader = NativePairLoader(
                    root, cfg.train.image_size, seed=cfg.train.seed,
                    ffhq_size=cfg.train.image_size if args.stage2 else 0)
                if loader.num_clips > 0:
                    print(f"using native emodata loader for {root}")
                    return loader.batches(gb)
            except FileNotFoundError:
                pass  # no .emos shards at this root: use the Python npz reader
            except Exception as e:
                print(f"native loader unavailable for {root}: {e}")
        store = ShardedClipStore(root, split=split)
        ds = PairDataset(store, cfg.train.image_size, augment=(split == "train"),
                         augment_geometric=cfg.train.augment_geometric_train,
                         augment_color=cfg.train.augment_color_train,
                         aug_color_coef=cfg.train.aug_color_coef,
                         warp_aug_color_coef=cfg.train.warp_aug_color_coef,
                         gray_source_prob=cfg.train.gray_source_prob,
                         seed=cfg.train.seed,
                         ffhq_size=cfg.train.image_size if args.stage2 else 0,
                         process_index=jax.process_index(),
                         process_count=jax.process_count())
        return ds.batches(gb)

    main_stream = make_stream(args.data_root)
    second = make_stream(args.second_data_root) if args.second_data_root else None
    third = make_stream(args.third_data_root) if args.third_data_root else None
    if third is None and args.stills_root:
        from emoportraits_tpu.data.stills import StillsDataset

        third = StillsDataset(args.stills_root, cfg.train.image_size).batches(
            cfg.train.batch_size * jax.local_device_count())
        args.mead_every = args.stills_every
    # background-thread prefetch so host sampling/augmentation overlaps device steps
    # (the reference relies on torch DataLoader workers for this)
    train_stream = Prefetcher(InterleavedStream(
        main_stream, second, third,
        sec_dataset_every=cfg.train.sec_dataset_every if second else 0,
        mead_every=args.mead_every if third else 0), depth=2)
    test_stream = make_stream(args.data_root, split="test")

    if args.stage2:
        _train_stage2(cfg, args, train_stream)
        return

    tower_variables = None
    if args.towers_dir:
        import os

        from emoportraits_tpu.port.cli import load_ported

        tower_variables = {
            os.path.splitext(f)[0]: load_ported(os.path.join(args.towers_dir, f))
            for f in sorted(os.listdir(args.towers_dir)) if f.endswith(".npz")}
        print(f"loaded ported towers: {sorted(tower_variables)}")

    trainer = Trainer(cfg, train_stream, test_stream,
                      log_dir=args.log_dir, checkpoint_dir=args.checkpoint_dir,
                      tower_variables=tower_variables,
                      strict_towers=args.strict_towers)
    trainer.fit(epochs=args.epochs, iters_per_epoch=args.iters)


def _train_stage2(cfg, args, train_stream):
    """Stage-2 training loop: frozen stage-1 predictions -> enhancer + its own D
    (reference models/stage_2/base/volumetric_avatar_two.py:589-780, train loop parity
    with stage 1). The 512px ground truth is the stream's target frame; the stage-1
    prediction is produced live from a frozen (optionally checkpointed) stage-1 model."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emoportraits_tpu.models.discriminator import MultiScaleDiscriminator
    from emoportraits_tpu.models.stage1 import VolumetricAvatar
    from emoportraits_tpu.models.stage2 import Stage2Enhancer
    from emoportraits_tpu.train.stage2_step import (
        Stage2TrainState,
        make_stage2_train_step,
    )
    from emoportraits_tpu.train.towers import build_loss_towers
    from emoportraits_tpu.train.trainer import apply_trace_knobs

    # the enhancer is built from the same ResBlocks the trace-time knobs
    # target — honor the config here exactly like Trainer.__init__ does
    apply_trace_knobs(cfg)

    key = jax.random.PRNGKey(cfg.train.seed)
    s = cfg.train.image_size
    b = cfg.train.batch_size * jax.local_device_count()
    z = jnp.zeros((b, s, s, 3), jnp.float32)
    m1 = jnp.ones((b, s, s, 1), jnp.float32)
    th = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))

    model = VolumetricAvatar(cfg.model)
    gen_vars = jax.jit(model.init)(key, z, m1, z, th, th)
    if args.stage1_checkpoint:
        from emoportraits_tpu.train.checkpoint import restore_params

        gen_vars = {"params": restore_params(args.stage1_checkpoint,
                                             gen_vars["params"]),
                    "sn_state": gen_vars.get("sn_state", {})}

    towers, frozen = build_loss_towers(cfg, key, tiny=(s <= 64))
    hp = jax.jit(lambda p, x: towers.head_pose_apply(p, x))
    enc = jax.jit(lambda v, s_, mk, t: model.apply(v, s_, mk, t,
                                                   method=model.encode_source))
    drv = jax.jit(lambda v, st, d, t: model.apply(v, st, d, t,
                                                  method=model.drive)[0])

    s2cfg = cfg.stage2 if s >= cfg.stage2.image_size else \
        type(cfg.stage2)(image_size=s, latent_size=max(s // 8, 8),
                         latent_channels=16, latent_depth=4, num_channels=16,
                         enc_channel_mult=1.0, dec_channel_mult=1.0,
                         max_channels=64, dec_num_blocks=2,
                         dec_feat_channels=(32, 32, 32, 32))
    enh = Stage2Enhancer(s2cfg, use_ws=cfg.model.use_ws, use_sn=cfg.model.use_sn)
    dis = MultiScaleDiscriminator(cfg.model.discriminator)
    enh_vars = jax.jit(enh.init)(key, z, m1)
    dis_vars = jax.jit(dis.init)(key, z)
    # second (mixing) discriminator — use_second_dis default True
    # (volumetric_avatar_two.py:73,503-515)
    dis2_vars = None
    second_dis_apply = None
    if s2cfg.use_second_dis:
        dis2 = MultiScaleDiscriminator(cfg.model.discriminator)
        dis2_vars = jax.jit(dis2.init)(jax.random.fold_in(key, 2), z)
        second_dis_apply = lambda v, img: dis2.apply(v, img)

    def enhancer_apply(variables, pred, mask, matte=None):
        return enh.apply(variables, pred, mask, matte, mutable=["sn_state"])

    state = Stage2TrainState.create(cfg, enh_vars, dis_vars, dis2_vars)
    # donate the state like the stage-1 sharded step (parallel/mesh.py): the
    # previous Stage2TrainState is dead once the step launches, so XLA reuses
    # its buffers instead of holding both generations live
    step = jax.jit(make_stage2_train_step(
        cfg, enhancer_apply, lambda v, img: dis.apply(v, img),
        second_dis_apply=second_dis_apply,
        vgg19_apply=towers.vgg19_apply, vgg19_params=towers.vgg19_params,
        face_parsing=frozen.face_parsing, matting=frozen.matting),
        donate_argnums=(0,))

    iters = args.iters or cfg.train.train_epoch_len
    epochs = args.epochs or 1
    rng = jax.random.PRNGKey(1)
    for epoch in range(epochs):
        for i in range(iters):
            hb = next(train_stream)
            src = jnp.asarray(hb["source_img"])
            tgt = jnp.asarray(hb["target_img"])
            mask = jnp.asarray(hb.get("source_mask", np.ones_like(src[..., :1])))
            avatar = enc(gen_vars, src, mask, hp(towers.head_pose_params, src))
            pred = drv(gen_vars, avatar, tgt, hp(towers.head_pose_params, tgt))
            # cross-reenactment mixing prediction: same avatar driven by the batch
            # ROLLED driver (stage-1 mixing semantics, va.py:634-646) feeds the
            # second D + cycle-mix terms
            mix_drv = jnp.roll(tgt, 1, axis=0)
            pred_mix = drv(gen_vars, avatar, mix_drv,
                           hp(towers.head_pose_params, mix_drv))
            # stage-2 ground truth: the FFHQ-aligned 512px crop from the stored
            # per-frame theta (reference target_img_ffhq, volumetric_avatar_two.py:686).
            # Stores without thetas fall back to the plain target — fine for smoke
            # runs, wrong for real data, hence the one-time warning.
            if "target_img_ffhq" in hb:
                tgt_ffhq = jnp.asarray(hb["target_img_ffhq"])
                tgt_ffhq_mask = jnp.asarray(hb["target_mask_ffhq"])
            else:
                if not getattr(_train_stage2, "_warned_ffhq", False):
                    print("WARNING: store has no ffhq_theta payload; using the "
                          "plain target as stage-2 ground truth (smoke-run "
                          "stand-in — convert real data with "
                          "emoportraits_tpu.data.convert for FFHQ crops)")
                    _train_stage2._warned_ffhq = True
                tgt_ffhq = tgt
                tgt_ffhq_mask = jnp.asarray(
                    hb.get("target_mask", np.ones_like(tgt[..., :1])))
            batch = {"pred_target_img": pred, "pred_mixing_img": pred_mix,
                     "target_img_ffhq": tgt_ffhq,
                     "target_mask_ffhq": tgt_ffhq_mask}
            rng, sk = jax.random.split(rng)
            state, metrics = step(state, batch, sk)
        print(f"stage2 epoch {epoch}: "
              f"{ {k: round(float(v), 4) for k, v in metrics.items()} }")


if __name__ == "__main__":
    main()
