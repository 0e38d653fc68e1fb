"""Drive the new RTNet tanh-polar parser on the real TPU at prod shape."""
import time
import jax, jax.numpy as jnp
print("devices:", jax.devices())

from emoportraits_tpu.models.rtnet import RTNetParser
from emoportraits_tpu.geometry.roi_tanh_polar import (
    roi_tanh_polar_warp, roi_tanh_polar_restore, roi_from_keypoints)

key = jax.random.PRNGKey(0)
B, S = 1, 512
# smooth stimulus: white noise aliases under the polar grid's outer-radius
# undersampling, which would measure the stimulus, not the transform
img = jax.image.resize(jax.random.uniform(key, (B, 16, 16, 3), jnp.float32),
                       (B, S, S, 3), "bilinear")
kp = jax.random.uniform(jax.random.fold_in(key, 1), (B, 68, 2),
                        minval=-0.4, maxval=0.4)

# roundtrip on TPU
roi = roi_from_keypoints(kp, S)
print("roi:", [float(x) for x in roi[0]])
polar = roi_tanh_polar_warp(img, roi, 256, 256)
back = roi_tanh_polar_restore(polar, roi, S, S)
err = float(jnp.abs(back - img)[:, 200:312, 200:312].mean())
print("roundtrip central err:", err)
assert err < 0.05

# full-size parser (prod polar_size=256, ResNet-50 trunk)
net = RTNetParser()
params = net.init(key, img[:, :256, :256], jnp.asarray([[32., 32., 224., 224.]]))
n = sum(x.size for x in jax.tree.leaves(params))
print(f"params: {n/1e6:.1f}M")

fn = jax.jit(lambda p, i, k: net.apply(p, i, k, method=net.face_mask_from_keypoints))
t0 = time.time()
mask = fn(params, img, kp)
mask.block_until_ready()
print(f"compile+first: {time.time()-t0:.1f}s, mask {mask.shape} "
      f"range [{float(mask.min()):.3f}, {float(mask.max()):.3f}]")
t0 = time.time()
for _ in range(10):
    mask = fn(params, img, kp)
mask.block_until_ready()
print(f"warm: {(time.time()-t0)/10*1000:.2f} ms/call (B=1 512px, host readback below)")
print("checksum:", float(mask.sum()))
assert jnp.isfinite(mask).all()
print("OK")
