"""Trainer: epoch loop, multi-stream interleave, eval metrics, checkpointing.

Reference: train.py:38-470 — Trainer.__init__ builds model/optimizers/datasets/logger
and wraps in DDP; train() runs epochs with FEED/MEAD splicing, per-epoch test loop under
no-grad computing SSIM/PSNR/LPIPS (train.py:305-353), and checkpoint save/load
(:357-391, :100-171). TPU-native differences:
  * one jitted train step (gen+dis) over a data mesh replaces the DDP/optimizer loop;
  * the input pipeline is host-side numpy feeding sharded device batches;
  * checkpoints are orbax (train/checkpoint.py), metrics go to JSONL/W&B (train/logger.py).
"""
from __future__ import annotations

import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..losses import psnr as psnr_metric
from ..losses import ssim as ssim_metric
from ..models.discriminator import MultiScaleDiscriminator
from ..models.stage1 import VolumetricAvatar
from ..parallel.mesh import (
    make_data_mesh,
    make_sharded_train_step,
    replicate_state,
    shard_batch,
)
from .checkpoint import CheckpointManager
from .forward import make_gen_apply
from .logger import MetricsLogger
from .state import TrainState, param_count
from .step import LossTowers, make_train_step
from .towers import FrozenNets, build_loss_towers


def apply_trace_knobs(cfg: ExperimentConfig) -> None:
    """Apply the config's trace-time memory knobs to the ops-level globals.

    These are trace-time switches (see ops/blocks.py) rather than module
    attributes because ResBlock/GroupNorm are constructed in ~40 places and the
    knobs must not change any module pytree. MUST run before anything jits the
    model; Trainer.__init__ calls it first. The batch-2 512px production
    geometry stack (DESIGN.md "Train at batch 2 (round 5)") is
    `bf16_gn_stats=True, gn_lane_pack=True, fuse_down_convs=False` + remat.
    """
    from ..ops.blocks import set_down_fusion, set_gn_lane_pack, set_gn_lowp_stats

    set_gn_lowp_stats(bool(cfg.train.bf16_gn_stats))
    set_gn_lane_pack(bool(cfg.train.gn_lane_pack))
    set_down_fusion(bool(cfg.train.fuse_down_convs))


class Trainer:
    def __init__(self, cfg: ExperimentConfig, train_stream: Iterator,
                 test_stream: Optional[Iterator] = None,
                 log_dir: str = "logs", checkpoint_dir: Optional[str] = None,
                 tower_variables: Optional[Dict] = None,
                 custom_test_images: Optional["np.ndarray"] = None,
                 towers: Optional[LossTowers] = None,
                 frozen_nets: Optional[FrozenNets] = None,
                 tiny_towers: bool = False,
                 strict_towers: bool = False,
                 canonical_keypoints: Optional["np.ndarray"] = None):
        self.cfg = cfg
        apply_trace_knobs(cfg)
        self.train_stream = train_stream
        self.test_stream = test_stream
        # fixed smoke portraits spliced into the first eval batch each epoch
        # (reference --custom_test, train.py:313-337)
        self.custom_test_images = custom_test_images

        key = jax.random.PRNGKey(cfg.train.seed)
        self.model = VolumetricAvatar(cfg.model)
        self.dis = MultiScaleDiscriminator(cfg.model.discriminator)

        s = cfg.train.image_size
        b = cfg.train.batch_size
        z = jnp.zeros((b, s, s, 3), jnp.float32)
        m1 = jnp.ones((b, s, s, 1), jnp.float32)
        th = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
        self.dis2 = (MultiScaleDiscriminator(cfg.model.discriminator2)
                     if cfg.model.use_mix_dis else None)
        self.sg_d = None
        if cfg.train.use_stylegan_d:
            from ..models.stylegan2_d import DiscriminatorStyleGAN2
            self.sg_d = DiscriminatorStyleGAN2(cfg.model.stylegan_d)
        with jax.default_device(jax.devices("cpu")[0]):
            gen_vars = jax.jit(self.model.init)(key, z, m1, z, th, th)
            dis_vars = jax.jit(self.dis.init)(key, z)
            dis2_vars = (jax.jit(self.dis2.init)(jax.random.fold_in(key, 2), z)
                         if self.dis2 is not None else None)
            sg_vars = (jax.jit(self.sg_d.init)(jax.random.fold_in(key, 3), z)
                       if self.sg_d is not None else None)
            if towers is None:
                towers, built_frozen = build_loss_towers(
                    cfg, key, tower_variables, tiny=tiny_towers)
                frozen_nets = frozen_nets or built_frozen
        self.towers = towers
        self.frozen_nets = frozen_nets or FrozenNets()
        # tower provenance: surfaced in logs so a prod run can't silently train
        # against random/stand-in evaluators (strict mode fails loudly)
        if self.frozen_nets.provenance:
            print(f"towers/provenance: {self.frozen_nets.provenance}")
        if strict_towers:
            from .towers import assert_towers_ported
            assert_towers_ported(self.frozen_nets)
        # theta_from_keypoints (reference estimate_head_pose_from_keypoints=False,
        # va.py:380-384): drop the regressor and fit training thetas from the
        # stored landmarks against the canonical template
        kp_thetas = cfg.model.theta_from_keypoints
        if kp_thetas and canonical_keypoints is None:
            raise ValueError("model.theta_from_keypoints=True requires "
                             "Trainer(canonical_keypoints=<(68, 3) template>)")
        gen_apply = make_gen_apply(
            cfg, self.model,
            None if kp_thetas else towers.head_pose_apply,
            towers.head_pose_params,
            canonical_keypoints=(jnp.asarray(canonical_keypoints)
                                 if kp_thetas else None),
            face_parsing=self.frozen_nets.face_parsing,
            matting=self.frozen_nets.matting,
            rtnet=self.frozen_nets.rtnet)
        self._gen_apply = jax.jit(gen_apply)  # also drives the debug-visuals grid
        dis_apply = lambda variables, img: self.dis.apply(variables, img)

        # global batch = per-device batch x MESH devices (cfg.parallel.num_devices
        # can pin a mesh smaller than the host's device count — the state's
        # ring buffers must be sized for the batches that mesh actually sees);
        # each host's stream yields global_b / process_count samples
        # (shard_batch assembles the global array)
        n_mesh = (cfg.parallel.num_devices if cfg.parallel.num_devices > 1
                  else jax.local_device_count())
        global_b = b * n_mesh * jax.process_count()
        self.state = TrainState.create(cfg, gen_vars, dis_vars, batch_size=global_b,
                                       dis2_variables=dis2_vars, sg_variables=sg_vars)
        step = make_train_step(
            cfg, gen_apply, dis_apply, towers,
            dis2_apply_raw=(lambda v, img: self.dis2.apply(v, img))
            if self.dis2 is not None else None,
            sg_apply_raw=(lambda v, img: self.sg_d.apply(v, img))
            if self.sg_d is not None else None)

        self.mesh = make_data_mesh(
            cfg.parallel.num_devices if cfg.parallel.num_devices > 1 else None,
            axis=cfg.parallel.data_axis)
        state_sharding = None
        if cfg.parallel.fsdp:
            from ..parallel.mesh import fsdp_state_sharding
            state_sharding = fsdp_state_sharding(self.mesh, self.state,
                                                 cfg.parallel.data_axis)
        self.sharded_step = make_sharded_train_step(step, self.mesh,
                                                    with_tower_params=True,
                                                    state_sharding=state_sharding)
        if state_sharding is not None:
            self.state = jax.tree.map(lambda x, s: jax.device_put(x, s),
                                      self.state, state_sharding)
        else:
            self.state = replicate_state(self.state, self.mesh)
        # frozen-tower weights ride as a replicated ARGUMENT (not HLO constants):
        # the 512px prod program with inlined towers exceeds compile-payload limits
        from .step import cast_tower_params_bf16, tower_params_pytree
        tp = tower_params_pytree(towers, self.frozen_nets)
        if cfg.train.bf16_towers:
            tp = cast_tower_params_bf16(tp)
        self._tower_params = replicate_state(tp, self.mesh)

        self.logger = MetricsLogger(log_dir, cfg.train.logging_freq,
                                    experiment_name=cfg.experiment_name)
        self.ckpt = (CheckpointManager(checkpoint_dir, cfg)
                     if checkpoint_dir else None)
        if self.ckpt is not None and self.ckpt.latest_step() is not None:
            self.state = self.ckpt.restore(self.state)
            self.logger.iteration = int(self.state.step)
        self._hp_vars = towers.head_pose_params
        self._eval_drive = None
        self._lpips = None
        self._lpips_vars = (tower_variables or {}).get("lpips")
        print(f"generator params: {param_count(self.state.gen_params) / 1e6:.1f}M, "
              f"discriminator params: {param_count(self.state.dis_params) / 1e6:.1f}M")

    # ------------------------------------------------------------------- loops

    # every array the step consumes travels to device; the warp-aug expression
    # inputs feed the expression embedder and the keypoints feed gaze/eye crops.
    # (eyes/mouth/ears part masks are NOT batch inputs: they come from the live
    # BiSeNet pass inside the step, train/step.py part-mask branch.)
    _BATCH_KEYS = ("source_img", "target_img", "source_mask", "target_mask",
                   "source_warp_aug", "target_warp_aug",
                   "source_keypoints", "target_keypoints")

    def train_epoch(self, num_iters: Optional[int] = None) -> Dict[str, float]:
        num_iters = num_iters or self.cfg.train.train_epoch_len
        rng = jax.random.PRNGKey(int(self.logger.iteration))
        last = {}
        bf16 = self.cfg.train.bf16_activations
        for i in range(num_iters):
            host_batch = {k: v for k, v in next(self.train_stream).items()
                          if k in self._BATCH_KEYS}
            if bf16:
                # bf16 activations / fp32 params: cast image-like inputs on the way in
                host_batch = {
                    k: (np.asarray(v, np.float32).astype(jnp.bfloat16)
                        if np.asarray(v).dtype.kind == "f" else v)
                    for k, v in host_batch.items()}
            batch = shard_batch(
                {k: jnp.asarray(v) for k, v in host_batch.items()}, self.mesh)
            rng, step_rng = jax.random.split(rng)
            self.state, metrics = self.sharded_step(self.state, batch, step_rng,
                                                    self._tower_params)
            if self.cfg.train.normalize_losses:
                from .logger import normalize_losses_for_display
                metrics = normalize_losses_for_display(metrics, self.cfg.weights)
            flushed = self.logger.log(metrics)
            if flushed:
                last = flushed
        return last

    def evaluate(self, num_batches: Optional[int] = None) -> Dict[str, float]:
        """Held-out eval computing the reference's full per-epoch metric surface:
        SSIM/MS-SSIM/PSNR (whole frame + person/background separated), LPIPS,
        face-vector cosine, and expression-PCA explained variance
        (reference test loop train.py:305-353, metrics va_losses_and_visuals.py:638-723)."""
        if self.test_stream is None:
            return {}
        if num_batches is None:
            full = max(1, self.cfg.train.test_epoch_len
                       // max(self.cfg.train.test_batch_size, 1))
            cap = self.cfg.train.eval_max_batches
            num_batches = full if cap <= 0 else min(full, cap)
        if self._eval_drive is None:
            m = self.model
            enc = jax.jit(lambda v, s_, mk, t: m.apply(v, s_, mk, t,
                                                       method=m.encode_source))
            drv = jax.jit(lambda v, st, d, t: m.apply(v, st, d, t,
                                                      method=m.drive)[0])
            hp = jax.jit(lambda p, x: self.towers.head_pose_apply(p, x))
            self._eval_drive = (enc, drv, hp)
            self._eval_expr = jax.jit(lambda v, d, t: m.apply(
                v, d, t, method=m.expression_vector))
        if self._lpips is None:
            from ..losses.lpips import LPIPS

            net = LPIPS()
            s = self.cfg.train.image_size
            if self._lpips_vars is None:
                with jax.default_device(jax.devices("cpu")[0]):
                    self._lpips_vars = jax.jit(net.init)(
                        jax.random.PRNGKey(0),
                        jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3)))
            self._lpips = jax.jit(net.apply)
        enc, drv, hp = self._eval_drive
        # serve from EMA params when tracked (utils/ema.py; cfg.train.ema_decay)
        gen_params = (self.state.ema_params if self.state.ema_params is not None
                      else self.state.gen_params)
        variables = {"params": gen_params, "sn_state": self.state.gen_sn_state}
        # standing BN statistics before eval (reference utils/stats_calc.py:
        # momentum=1 hook accumulation, then averaged): replace every BN
        # running_mean/var with the MEAN of per-batch stats over a few
        # calibration batches. No-op for prod (GN — no BN leaves).
        from ..utils.bn_stats import has_batch_norm, recalculate_bn_stats

        if num_batches > 0 and has_batch_norm(variables):
            cal = []
            for _ in range(min(4, num_batches)):
                hb = {k: jnp.asarray(v)
                      for k, v in next(self.train_stream).items()
                      if k in self._BATCH_KEYS}
                cal.append(hb)
            variables = recalculate_bn_stats(
                lambda v, b: self._gen_apply(v, b, jax.random.PRNGKey(0))[1],
                variables, cal)
        from ..losses.metrics import ms_ssim as ms_ssim_metric

        fv = self.towers.face_vector_embed
        out: Dict[str, list] = {}

        def add(k, v):
            out.setdefault(f"test/{k}", []).append(float(v))

        expr_vecs = []
        for bi in range(num_batches):
            batch = next(self.test_stream)
            if bi == 0 and self.custom_test_images is not None:
                # splice the fixed smoke portraits into the first eval batch
                n = min(len(self.custom_test_images), len(batch["source_img"]))
                for k in ("source_img", "target_img"):
                    batch[k] = np.concatenate(
                        [self.custom_test_images[:n], batch[k][n:]])
            src = jnp.asarray(batch["source_img"])
            tgt = jnp.asarray(batch["target_img"])
            mask = jnp.asarray(batch.get("source_mask", np.ones_like(src[..., :1])))
            tgt_mask = jnp.asarray(
                batch.get("target_mask", np.ones_like(tgt[..., :1])))
            s_theta = hp(self._hp_vars, src)
            t_theta = hp(self._hp_vars, tgt)
            st = enc(variables, src, mask, s_theta)
            pred = drv(variables, st, tgt, t_theta)
            add("ssim", ssim_metric(pred, tgt))
            add("psnr", psnr_metric(pred, tgt))
            # person/background-separated variants (reference suffix `_person`/`_back`,
            # va_losses_and_visuals.py:690-712: metrics on mask-multiplied images)
            add("ssim_person", ssim_metric(pred * tgt_mask, tgt * tgt_mask))
            add("psnr_person", psnr_metric(pred * tgt_mask, tgt * tgt_mask))
            inv = 1.0 - tgt_mask
            add("ssim_back", ssim_metric(pred * inv, tgt * inv))
            add("psnr_back", psnr_metric(pred * inv, tgt * inv))
            add("lpips", self._lpips(self._lpips_vars, pred, tgt))
            if fv is not None:
                from ..losses.expression import cosine_sim

                ep = fv(self.towers.face_vector_params, pred)
                et = fv(self.towers.face_vector_params, tgt)
                add("face_vector_cos", jnp.mean(cosine_sim(ep, et)))
            if tgt.shape[1] >= 176:  # MS-SSIM needs 5 halvings over an 11px window
                add("ms_ssim", ms_ssim_metric(pred, tgt))
            expr_vecs.append(np.asarray(self._eval_expr(variables, tgt, t_theta)))
        metrics = {k: float(np.mean(v)) for k, v in out.items() if v}
        if not expr_vecs:
            return metrics
        # expression-space PCA diagnostics (reference va_losses_and_visuals.py:670-674)
        vecs = np.concatenate(expr_vecs)
        if len(vecs) >= 4:
            from ..utils.pca_metrics import pca_metrics

            metrics.update({f"test/pca_{k}": float(v)
                            for k, v in pca_metrics(vecs).items()
                            if np.ndim(v) == 0})  # spectrum array stays out of scalars
        return metrics

    def install_preemption_handler(self) -> None:
        """Save a checkpoint on SIGTERM/SIGINT before exiting — preemption tolerance
        the reference lacks (SURVEY.md §5: 'failure detection: none'; resume there is
        manual). Safe to call once before fit()."""
        import signal
        import sys

        def _handler(signum, frame):
            if self.ckpt is not None:
                self.ckpt.save(int(self.state.step), self.state)
                self.ckpt.wait()
            sys.exit(0)

        signal.signal(signal.SIGTERM, _handler)
        signal.signal(signal.SIGINT, _handler)

    def collect_expression_vectors(self, num_batches: int = 4):
        """Gather expression embeddings over held-out data for the PCA diagnostics
        (reference saves exp vectors per test epoch, va_losses_and_visuals.py:670-674)."""
        import numpy as np

        if self.test_stream is None:
            return None
        if self._eval_drive is None:
            self.evaluate(num_batches=0)
        _, _, hp = self._eval_drive
        expr = jax.jit(lambda v, d, t: self.model.apply(
            v, d, t, method=self.model.expression_vector))
        variables = {"params": self.state.gen_params,
                     "sn_state": self.state.gen_sn_state}
        vecs = []
        for _ in range(num_batches):
            batch = next(self.test_stream)
            img = jnp.asarray(batch["target_img"])
            theta = hp(self._hp_vars, img)
            vecs.append(np.asarray(expr(variables, img, theta)))
        return np.concatenate(vecs)

    def save_visuals(self, name: str = "eval") -> None:
        """Full debug panel grid for one held-out batch: every image-like output of
        the TRAINING forward (prediction, mixing, refined masks, matting alpha,
        aligned crops, volume-renderer rgb/depth) plus keypoint stickmen — the
        reference's ~40-panel get_visuals grid (va_losses_and_visuals.py:914-1054)
        built generically from the forward's out dict."""
        import numpy as np

        if self.test_stream is None or not self.logger.is_leader:
            return
        batch = next(self.test_stream)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        out, _ = self._gen_apply(
            {"params": self.state.gen_params, "sn_state": self.state.gen_sn_state},
            jbatch, jax.random.PRNGKey(0))
        from ..utils.visuals import draw_stickman_batch, make_visuals_grid

        panels: Dict[str, "np.ndarray"] = {
            "source_img": np.asarray(jbatch["source_img"], np.float32),
            "target_img": np.asarray(jbatch["target_img"], np.float32),
        }
        for key in sorted(out):
            v = out[key]
            if (hasattr(v, "ndim") and v.ndim == 4 and v.shape[-1] in (1, 3)
                    and min(v.shape[1], v.shape[2]) >= 8):
                a = np.asarray(v, np.float32)
                if "depth" in key:  # normalize depth maps into [0,1] for display
                    lo, hi = a.min(), a.max()
                    a = (a - lo) / (hi - lo + 1e-8)
                panels[key] = a
        for kp_key, panel in (("source_keypoints", "source_stickman"),
                              ("target_keypoints", "target_stickman")):
            if kp_key in batch:
                panels[panel] = draw_stickman_batch(
                    np.asarray(batch[kp_key]),
                    int(panels["target_img"].shape[1]))
        grid = make_visuals_grid(panels)
        self.logger.log_image_grid(name, grid[None])

    def fit(self, epochs: Optional[int] = None, iters_per_epoch: Optional[int] = None):
        epochs = epochs or self.cfg.train.max_epochs
        for epoch in range(self.logger.epoch, epochs):
            self.logger.epoch = epoch
            t0 = time.time()
            train_metrics = self.train_epoch(iters_per_epoch)
            eval_metrics = self.evaluate()
            if self.cfg.train.visuals_freq > 0:
                self.save_visuals(f"epoch_{epoch:04d}")
            if self.logger.is_leader:
                print(f"epoch {epoch}: {time.time() - t0:.1f}s "
                      f"train={train_metrics} eval={eval_metrics}")
            if self.ckpt is not None and \
                    epoch % self.cfg.train.latest_checkpoint_freq == 0:
                self.ckpt.save(int(self.state.step), self.state)
        if self.ckpt is not None:
            self.ckpt.wait()
