"""int8 quantized serving path (DecoderConfig.serve_int8 / Conv.quant).

Beyond-reference TPU perf feature: the decoder's 3x3 convs run int8 x int8 with
int32 MXU accumulation; weights quantize per-output-channel from the SN/WS-effective
kernel, activations use calibrated static per-tensor scales (the 'quant' collection,
grown by a mutable=["quant"] calibration pass)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoportraits_tpu.config import DecoderConfig
from emoportraits_tpu.models.decoder import Decoder
from emoportraits_tpu.ops.blocks import Conv

KEY = jax.random.PRNGKey(0)


def test_quant_conv_matches_fp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 32)).astype(np.float32))
    conv = Conv(24, (3, 3))
    qconv = Conv(24, (3, 3), quant=True)
    p = conv.init(KEY, x)
    qp = qconv.init(KEY, x)  # same param stream; adds the quant collection
    np.testing.assert_array_equal(np.asarray(p["params"]["kernel"]),
                                  np.asarray(qp["params"]["kernel"]))
    y_fp = conv.apply(p, x)
    _, muts = qconv.apply(qp, x, mutable=["quant"])  # calibration grows act_scale
    assert float(muts["quant"]["act_scale"]) >= float(jnp.max(jnp.abs(x)))
    yq = qconv.apply({"params": qp["params"], "quant": muts["quant"]}, x)
    rel = float(jnp.max(jnp.abs(yq - y_fp))) / (float(jnp.max(jnp.abs(y_fp))) + 1e-9)
    assert rel < 0.05, f"int8 conv relative error {rel}"


@pytest.mark.slow
def test_decoder_serve_int8_snr():
    """End-to-end: the int8 decoder's sigmoid image stays close to the fp32 one
    (PSNR gate) with identical parameters."""
    cfg = DecoderConfig(in_channels=64, image_size=64, latent_size=16,
                        num_channels=16, channel_mult=1.0, max_channels=64,
                        num_blocks=2)
    dec = Decoder(cfg, use_ws=True, use_sn=True)
    dec_q = Decoder(dataclasses.replace(cfg, serve_int8=True),
                    use_ws=True, use_sn=True)
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.standard_normal((1, 16, 16, 64)).astype(np.float32))
    p = dec.init(KEY, feat)
    pq = dec_q.init(KEY, feat)
    v = {"params": p["params"], "sn_state": p.get("sn_state", {}),
         "quant": pq["quant"]}
    img_fp = dec.apply(p, feat)[0]
    _, muts = dec_q.apply(v, feat, mutable=["quant"])
    v["quant"] = muts["quant"]
    img_q = dec_q.apply(v, feat)[0]
    mse = float(jnp.mean((img_q - img_fp) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert img_q.shape == img_fp.shape
    assert psnr > 30.0, f"int8 decoder PSNR {psnr:.1f} dB vs fp32"
