"""Multi-chip serving: spatial-parallel drive + stage-cascade pipelining.

The reference serves on exactly one GPU (notebooks/infer.py — a single
`InferenceWrapper`, no distributed inference of any kind). Two TPU-native scale-out
paths beyond the per-chip 60 fps drive loop:

* `SpatialDriveServer` — ONE stream at lower latency: the drive step jitted under a
  1-D `sp` mesh so the bandwidth-bound 512px decoder splits its activation height
  across chips (see parallel/spatial.py; GSPMD halo exchange over ICI). Latency
  scales with aggregate HBM bandwidth, the measured bottleneck (DESIGN.md).
* `CascadePipeline` — stage-1 + stage-2 at stage-1 THROUGHPUT: the two model stages
  live on different chips and successive frames overlap (software pipelining via
  JAX async dispatch — frame N's stage-1 runs while frame N-1's stage-2 refines on
  the neighbour chip; the inter-stage hop is a device-to-device ICI copy). The
  reference runs the same cascade strictly sequentially on one GPU
  (infer_s2.py:352-390).

Many-stream serving needs neither: avatars are data-sharded one-per-chip
(DESIGN.md serving analysis — the model is compute-dense at batch 1).
"""
from __future__ import annotations

from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp

from .spatial import make_dp_sp_mesh, make_space_mesh  # re-export  # noqa: F401


class SpatialDriveServer:
    """Single-stream, latency-oriented serving over a spatial (`sp`) mesh.

    API mirrors the single-chip split (stage1.encode_source / drive): the cached
    canonical volume lives SHARDED across the mesh between frames — only the
    driver frame (0.75 MB) crosses the host boundary per step.
    """

    def __init__(self, cfg, variables, mesh=None, head_pose_variables=None):
        from ..models.head_pose import HeadPoseRegressor
        from ..models.stage1 import VolumetricAvatar

        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_space_mesh()
        self.model = VolumetricAvatar(cfg.model)
        self.variables = variables
        self.head_pose_variables = head_pose_variables
        self._head_pose = HeadPoseRegressor()
        m = self.model
        self._encode = jax.jit(
            lambda v, s, mk, t: m.apply(v, s, mk, t, method=m.encode_source))
        self._drive = jax.jit(
            lambda v, st, d, t: m.apply(v, st, d, t, method=m.drive)[0])
        self._theta = jax.jit(lambda v, img: self._head_pose.apply(v, img))
        self._state = None

    def estimate_theta(self, img: jax.Array) -> jax.Array:
        if self.head_pose_variables is None:
            return jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                    (img.shape[0], 4, 4))
        with jax.sharding.set_mesh(self.mesh):
            return self._theta(self.head_pose_variables, img)

    def set_source(self, source_img: jax.Array, source_mask: jax.Array,
                   source_theta: Optional[jax.Array] = None) -> None:
        theta = (source_theta if source_theta is not None
                 else self.estimate_theta(source_img))
        with jax.sharding.set_mesh(self.mesh):
            self._state = self._encode(self.variables, source_img, source_mask,
                                       theta)

    def drive(self, driver_img: jax.Array,
              driver_theta: Optional[jax.Array] = None) -> jax.Array:
        assert self._state is not None, "call set_source() first"
        theta = (driver_theta if driver_theta is not None
                 else self.estimate_theta(driver_img))
        with jax.sharding.set_mesh(self.mesh):
            return self._drive(self.variables, self._state, driver_img, theta)


class CascadePipeline:
    """Stage-1 drive on one chip, stage-2 enhancement on another, pipelined.

    `submit(frame, theta)` dispatches asynchronously; `ready()` pops finished
    frames in order. With both stages under ~22 ms (measured: drive 16.7 ms,
    stage-2 21.8 ms), steady-state throughput is set by max(stage) instead of
    their 38 ms sum — the classic 2-stage pipeline, expressed entirely through
    JAX async dispatch + an inter-device copy, no collectives needed.
    """

    def __init__(self, cfg, stage1_variables, stage2_variables,
                 dev_stage1=None, dev_stage2=None, max_in_flight: int = 2):
        from ..models.stage1 import VolumetricAvatar
        from ..models.stage2 import Stage2Enhancer

        devices = jax.devices()
        self.dev1 = dev_stage1 if dev_stage1 is not None else devices[0]
        self.dev2 = dev_stage2 if dev_stage2 is not None else devices[
            1 % len(devices)]
        self.cfg = cfg
        self.model = VolumetricAvatar(cfg.model)
        self.enhancer = Stage2Enhancer(cfg.stage2)
        self.v1 = jax.device_put(stage1_variables, self.dev1)
        self.v2 = jax.device_put(stage2_variables, self.dev2)
        m = self.model
        self._encode = jax.jit(
            lambda v, s, mk, t: m.apply(v, s, mk, t, method=m.encode_source))
        # stage-1 emits the img_f feature tap consumed by the stage-2 decoder
        # (reference pred_feat, volumetric_avatar_two.py:681)
        self._s1 = jax.jit(
            lambda v, st, d, t: m.apply(v, st, d, t, stage_two=True,
                                        method=m.drive))
        self._s2 = jax.jit(lambda v, img, mask: self.enhancer.apply(v, img, mask))
        self._state = None
        self._pending = deque()
        self.max_in_flight = max_in_flight

    def set_source(self, source_img, source_mask, source_theta) -> None:
        args = jax.device_put((source_img, source_mask, source_theta), self.dev1)
        self._state = self._encode(self.v1, *args)

    def _dispatch(self, frame, theta):
        frame, theta = jax.device_put((frame, theta), self.dev1)
        img, _img_f = self._s1(self.v1, self._state, frame, theta)
        # inter-stage hop: async ICI copy; stage-2 queues on the neighbour chip
        img2 = jax.device_put(img, self.dev2)
        return self._s2(self.v2, img2, jnp.ones_like(img2[..., :1]))

    def submit(self, frame, theta) -> None:
        """Enqueue one driver frame (non-blocking up to max_in_flight)."""
        assert self._state is not None, "call set_source() first"
        if len(self._pending) >= self.max_in_flight:
            self._pending[0].block_until_ready()  # backpressure; ready() pops it
        self._pending.append(self._dispatch(frame, theta))

    def ready(self):
        """Pop the oldest finished frame (blocking), or None if queue is empty."""
        if not self._pending:
            return None
        return self._pending.popleft()

    def forward(self, frame, theta):
        """Synchronous convenience path: submit + drain one frame."""
        assert self._state is not None, "call set_source() first"
        return self._dispatch(frame, theta)

    def flush(self):
        outs = [jnp.asarray(o) for o in self._pending]
        self._pending.clear()
        return outs
