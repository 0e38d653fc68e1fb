"""Standing-statistics recalculation for BatchNorm (utils/bn_stats.py) — the
reference's stats_calc.py hook semantics (momentum=1 accumulation, averaged):
running stats become the MEAN of per-batch stats; spectral-norm u/v leaves in
the same sn_state collection are untouched."""
import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from emoportraits_tpu.ops.blocks import Conv, TrainBatchNorm
from emoportraits_tpu.utils.bn_stats import has_batch_norm, recalculate_bn_stats


class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = Conv(6, (3, 3), use_sn=True, name="conv")(x)
        return TrainBatchNorm(6, name="bn")(x)


def _batch_stats(variables, x):
    """Ground truth: per-batch mean + unbiased var of the BN input (the conv
    output in TRAINING mode, i.e. with the power-iterated spectral norm)."""
    conv_out, _ = Conv(6, (3, 3), use_sn=True, name="conv").apply(
        {"params": variables["params"]["conv"],
         "sn_state": variables["sn_state"]["conv"]}, x, mutable=["sn_state"])
    flat = np.asarray(conv_out, np.float64).reshape(-1, 6)
    return flat.mean(0), flat.var(0, ddof=1)


def test_recalculate_bn_stats_matches_batch_average():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((4, 8, 8, 3)), jnp.float32)
    net = Net()
    variables = net.init(jax.random.PRNGKey(0), x0)
    assert has_batch_norm(variables)

    batches = [jnp.asarray(rng.standard_normal((4, 8, 8, 3)) * (i + 1),
                           jnp.float32) for i in range(3)]

    def run_batch(v, b):
        return net.apply(v, b, mutable=["sn_state"])[1]["sn_state"]

    out = recalculate_bn_stats(run_batch, variables, batches)

    means, varis = zip(*[_batch_stats(variables, b) for b in batches])
    got_m = np.asarray(out["sn_state"]["bn"]["running_mean"])
    got_v = np.asarray(out["sn_state"]["bn"]["running_var"])
    np.testing.assert_allclose(got_m, np.mean(means, axis=0), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(got_v, np.mean(varis, axis=0), rtol=2e-3,
                               atol=2e-3)
    # spectral-norm power-iteration state rides the same collection — untouched
    np.testing.assert_array_equal(
        np.asarray(out["sn_state"]["conv"]["u"]),
        np.asarray(variables["sn_state"]["conv"]["u"]))
    # input variables not mutated
    assert float(np.asarray(variables["sn_state"]["bn"]["running_mean"]).sum()) == 0.0


def test_recalculate_noop_without_bn_or_batches():
    x = jnp.zeros((2, 4, 4, 3))
    net = Net()
    variables = net.init(jax.random.PRNGKey(1), x)
    out = recalculate_bn_stats(lambda v, b: v["sn_state"], variables, [])
    assert out is variables  # no batches -> unchanged
    assert not has_batch_norm({"params": {}})
