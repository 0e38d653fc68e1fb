"""InferenceWrapper: the user-facing streaming-reenactment API.

Reference: notebooks/infer.py:62-355 `InferenceWrapper` — reconstructs the model from the
saved config, loads weights, and exposes `forward(source_image, driver_image, ...)` with
a cached per-avatar source encoding and a per-frame driver loop with head-pose momentum
smoothing (:571-581). Preprocessing there uses mediapipe + MODNet on CPU; here the crop
is driven by the frozen head-pose net (any external face detector can be plugged in via
`set_crop_fn`), and masks default to full-frame when no matting network is supplied.

TPU structure: `encode_source` is jitted once per avatar; `drive` is ONE jitted program
per frame (expression embed + uv warp + 2 grid-samples + decode) with the cached
canonical volume living on device — no host sync in the frame loop.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..models.head_pose import HeadPoseRegressor
from ..models.stage1 import AvatarState, VolumetricAvatar


class InferenceWrapper:
    def __init__(self, cfg: ExperimentConfig, variables, head_pose_variables=None,
                 theta_momentum: float = 0.0, device=None,
                 stage2_variables=None, face_parsing_variables=None,
                 auto_crop: bool = False, crop_smooth: bool = False):
        self.cfg = cfg
        self.model = VolumetricAvatar(cfg.model)
        self.head_pose = HeadPoseRegressor()
        self.device = device or jax.devices()[0]
        self.variables = jax.device_put(variables, self.device)
        # serve in the parameters' dtype (bf16 params -> bf16 activations)
        leaves = jax.tree.leaves(self.variables.get("params", self.variables))
        self._dtype = leaves[0].dtype if leaves and leaves[0].dtype in (
            jnp.bfloat16, jnp.float32) else jnp.float32
        # optional stage-2 enhancer cascade (reference infer_s2.py:352-390)
        self._stage2 = None
        if stage2_variables is not None:
            from ..models.stage2 import Stage2Enhancer

            enh = Stage2Enhancer(cfg.stage2)
            s2_vars = jax.device_put(stage2_variables, self.device)
            self._stage2 = jax.jit(
                lambda img, mask: enh.apply(s2_vars, img, mask))
        self.head_pose_variables = (
            jax.device_put(head_pose_variables, self.device)
            if head_pose_variables is not None else None)
        self.theta_momentum = theta_momentum
        self._prev_theta = None
        self._source_theta = None
        self._state: Optional[AvatarState] = None
        self._crop_fn: Optional[Callable] = None
        # Built-in preprocessing from our frozen BiSeNet parser (replaces the
        # reference's external mediapipe detector + face_idt source mask,
        # infer.py:379-424): auto_crop enables detection+square-crop of raw
        # images; the parser also supplies the source face mask in set_source
        # when the caller passes none.
        self._parser = None
        if face_parsing_variables is not None:
            from ..models.face_parsing import FaceParser

            self._parser = FaceParser(
                jax.device_put(face_parsing_variables, self.device))
            if auto_crop:
                from .face_crop import make_crop_fn

                self._crop_fn = make_crop_fn(
                    self._parser.variables,
                    image_size=cfg.train.image_size, smooth=crop_smooth)

        m = self.model
        self._encode = jax.jit(
            lambda v, s, mk, t: m.apply(v, s, mk, t, method=m.encode_source))
        self._drive = jax.jit(
            lambda v, st, d, t: m.apply(v, st, d, t, method=m.drive)[0])
        self._drive_s2 = jax.jit(
            lambda v, st, d, t: m.apply(v, st, d, t, stage_two=True, method=m.drive))
        if self.head_pose_variables is not None:
            hp = self.head_pose
            self._theta = jax.jit(lambda v, img: hp.apply(v, img))

        # ---- fused streaming path: ONE dispatch per frame, uint8 in / uint8 out ----
        # The split path (prep -> theta -> momentum -> drive) costs 3+ dispatches and
        # fp32-sized transfers per frame; fused, the pose estimate, momentum
        # smoothing, drive, and 8-bit quantization all run in one program and the
        # tunnel moves 0.75 MB each way instead of 3 MB.
        def _frame(v, hp_v, st, raw_u8, prev_theta, momentum_w):
            img = raw_u8.astype(self._dtype)[None] / 255.0
            if self.head_pose_variables is not None:
                theta = self.head_pose.apply(hp_v, img)
            else:
                theta = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (1, 4, 4))
            theta = momentum_w * prev_theta + (1.0 - momentum_w) * theta
            out = m.apply(v, st, img, theta, method=m.drive)[0]
            out = jnp.clip(out.astype(jnp.float32) * 255.0 + 0.5, 0, 255)
            return out[0].astype(jnp.uint8), theta

        self._frame = jax.jit(_frame)

    def set_crop_fn(self, fn: Callable[[np.ndarray], np.ndarray]) -> None:
        """Plug an external face detector/cropper (reference uses mediapipe,
        infer.py:379-403)."""
        self._crop_fn = fn

    def _prep(self, image: np.ndarray) -> jax.Array:
        """uint8/float HWC image -> (1, S, S, 3) float32 [0,1] on device."""
        if self._crop_fn is not None:
            image = self._crop_fn(image)
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        s = self.cfg.train.image_size
        if img.shape[0] != s or img.shape[1] != s:
            from PIL import Image

            img = np.asarray(
                Image.fromarray((img * 255).astype(np.uint8)).resize((s, s))
            ).astype(np.float32) / 255.0
        return jax.device_put(jnp.asarray(img, self._dtype)[None], self.device)

    def _estimate_theta(self, img: jax.Array) -> jax.Array:
        if self.head_pose_variables is None:
            return jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (img.shape[0], 4, 4))
        return self._theta(self.head_pose_variables, img)

    def _prep_mask(self, mask: np.ndarray, size: int) -> jax.Array:
        """(H, W) or (H, W, C) alpha/matte in uint8 or float -> (1, S, S, 1)."""
        m = np.asarray(mask)
        if m.dtype == np.uint8:
            m = m.astype(np.float32) / 255.0
        if m.ndim == 3:
            m = m[..., 0]
        if m.shape != (size, size):
            ys = np.linspace(0, m.shape[0] - 1, size).astype(int)
            xs = np.linspace(0, m.shape[1] - 1, size).astype(int)
            m = m[ys][:, xs]
        return jax.device_put(jnp.asarray(m, self._dtype)[None, ..., None],
                              self.device)

    def set_source(self, source_image: np.ndarray,
                   source_mask: Optional[np.ndarray] = None) -> None:
        """Encode the avatar once (reference SOURCE path, infer.py:379-507)."""
        src = self._prep(source_image)
        if source_mask is not None:
            mask = self._prep_mask(source_mask, self.cfg.train.image_size)
        elif self._parser is not None:
            # face_idt source mask, reference infer.py:410-424: binary
            # face/hair/neck mask from the parser (threshold semantics of
            # `(face_mask_source > 0.6).float()`)
            mask = self._parser(src.astype(jnp.float32))["mask"].astype(
                self._dtype)
        else:
            mask = jnp.ones_like(src[..., :1])
        theta = self._estimate_theta(src)
        self._state = self._encode(self.variables, src, mask, theta)
        self._source_theta = theta
        self._prev_theta = None

    def forward(self, driver_image: np.ndarray, *, smooth_pose: bool = True,
                stage_two: bool = False):
        """Per-frame drive (reference DRIVER path, infer.py:557-638). Returns
        (1, S, S, 3) image [0,1] (and the img_f feature tap when stage_two)."""
        assert self._state is not None, "call set_source() first"
        drv = self._prep(driver_image)
        theta = self._estimate_theta(drv)
        if smooth_pose and self.theta_momentum > 0 and self._prev_theta is not None:
            # momentum smoothing of the driver pose (reference infer.py:571-581)
            theta = (self.theta_momentum * self._prev_theta
                     + (1.0 - self.theta_momentum) * theta)
        self._prev_theta = theta
        if stage_two or self._stage2 is not None:
            img, img_f = self._drive_s2(self.variables, self._state, drv, theta)
            if self._stage2 is not None:
                # additive-residual refinement; the parser's face mask gates the
                # residual when available, full-frame otherwise (reference
                # recomputes MODNet x BiSeNet masks,
                # volumetric_avatar_two.py:611-614)
                if self._parser is not None:
                    s2_mask = self._parser(img.astype(jnp.float32))[
                        "mask"].astype(img.dtype)
                else:
                    s2_mask = jnp.ones_like(img[..., :1])
                img = self._stage2(img, s2_mask)
                return img
            return img, img_f
        return self._drive(self.variables, self._state, drv, theta)

    def forward_frame(self, driver_frame: np.ndarray) -> np.ndarray:
        """Production streaming drive: (S, S, 3) uint8 frame -> (S, S, 3) uint8
        reenactment, one fused device program per frame (pose estimate + momentum +
        drive + 8-bit quantize). The general `forward()` keeps the flexible float
        API; this is the latency path for live serving."""
        assert self._state is not None, "call set_source() first"
        s = self.cfg.train.image_size
        assert driver_frame.dtype == np.uint8 and driver_frame.shape == (s, s, 3), \
            "forward_frame wants a (S, S, 3) uint8 frame; use forward() otherwise"
        if self._prev_theta is None or self.theta_momentum <= 0:
            prev = jnp.zeros((1, 4, 4), jnp.float32)
            w = jnp.float32(0.0)
        else:
            prev = self._prev_theta
            w = jnp.float32(self.theta_momentum)
        out, theta = self._frame(self.variables, self.head_pose_variables,
                                 self._state, jnp.asarray(driver_frame), prev, w)
        self._prev_theta = theta
        return out

    def calibrate_quant(self, driver_images) -> None:
        """Grow the int8 activation scales (`quant` collection) on sample driver
        frames — required once per avatar/model when the decoder serves int8
        (DecoderConfig.serve_int8). Scales only increase, so calibration over a
        few representative frames upper-bounds the observed activations."""
        assert self._state is not None, "call set_source() first"
        assert "quant" in self.variables, \
            "serve_int8 decoder variables must carry the 'quant' collection"
        m = self.model
        cal = jax.jit(lambda v, st, d, t: m.apply(
            v, st, d, t, method=m.drive, mutable=["quant"])[1])
        for img in driver_images:
            drv = self._prep(img)
            theta = self._estimate_theta(drv)
            muts = cal(self.variables, self._state, drv, theta)
            self.variables = {**self.variables, "quant": muts["quant"]}

    def forward_mixed_pose(self, driver_image: np.ndarray):
        """Cross-identity reenactment with the MIXING pose: keep the driver's rotation
        and translation but the source's scale/stretch via polar decomposition
        (reference optional mixing theta at inference, infer.py:686 +
        get_mixing_theta semantics). Uses the source theta captured at set_source."""
        assert self._state is not None, "call set_source() first"
        from ..geometry.transforms import get_mixing_theta

        drv = self._prep(driver_image)
        driver_theta = self._estimate_theta(drv)
        if self._source_theta is None:
            theta = driver_theta
        else:
            mix = get_mixing_theta(self._source_theta[:, :3],
                                   driver_theta[:, :3])
            b = mix.shape[0]
            bottom = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 0.0, 1.0], mix.dtype), (b, 1, 4))
            theta = jnp.concatenate([mix, bottom], axis=1)
        return self._drive(self.variables, self._state, drv, theta)

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str, step: Optional[int] = None,
                        **kw) -> "InferenceWrapper":
        """Rebuild from a saved run (config.json + orbax state), parity with
        reconstructing args.txt at inference (infer.py:74-76). Restores the raw saved
        tree and extracts the generator variables."""
        import orbax.checkpoint as ocp

        from ..train.checkpoint import load_config

        cfg = load_config(checkpoint_dir)
        mngr = ocp.CheckpointManager(checkpoint_dir)
        step = mngr.latest_step() if step is None else step
        tree = mngr.restore(step)
        variables = {"params": tree["gen_params"]}
        if tree.get("gen_sn_state"):
            variables["sn_state"] = tree["gen_sn_state"]
        return cls(cfg, variables, **kw)
