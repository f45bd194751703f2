"""DLA-34 + bilinear upsample tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from centerpose_tpu.config import default_config, update_config
from centerpose_tpu.models.dla import bilinear_upsample
from centerpose_tpu.models.factory import create_model, init_model

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the default tier



def test_bilinear_upsample_2x_ramp():
    # A linear ramp must stay (piecewise) linear under bilinear 2x upsample.
    ramp = jnp.asarray(np.arange(4, dtype=np.float32))[None, None, :, None]
    x = jnp.broadcast_to(ramp, (1, 4, 4, 1))
    y = np.asarray(bilinear_upsample(x, 2))
    assert y.shape == (1, 8, 8, 1)
    row = y[0, 4, :, 0]
    # interior steps are constant 0.5 (linear interpolation)
    diffs = np.diff(row[1:-1])
    np.testing.assert_allclose(diffs, 0.5, atol=1e-5)


def test_bilinear_upsample_4x_shape_and_constancy():
    x = jnp.ones((2, 3, 5, 7))
    y = np.asarray(bilinear_upsample(x, 4))
    assert y.shape == (2, 12, 20, 7)
    # constant input stays constant in the interior
    np.testing.assert_allclose(y[:, 4:-4, 4:-4, :], 1.0, atol=1e-5)


def test_dla34_forward_shapes_and_params():
    cfg = update_config(
        default_config(),
        {"model": {"name": "dla_34", "input_res": 64, "output_res": 16,
                    "head_conv": 256}},
    )
    model = create_model(cfg)
    v = init_model(model, jax.random.PRNGKey(0), 64)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(v["params"]))
    # reference DLA-34 pose net is ~20M params
    assert 15e6 < n_params < 25e6, n_params
    out = model.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out["hm"].shape == (1, 16, 16, 1)
    assert out["hps"].shape == (1, 16, 16, 34)
    for k, o in out.items():
        assert np.isfinite(np.asarray(o)).all(), k


def test_dla34_gradient_flows_through_dcn():
    cfg = update_config(
        default_config(),
        {"model": {"name": "dla_34", "input_res": 64, "output_res": 16,
                    "head_conv": 64}},
    )
    model = create_model(cfg)
    v = init_model(model, jax.random.PRNGKey(0), 64)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 64, 64, 3)), jnp.float32
    )

    def loss(params):
        out = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, train=False
        )
        return jnp.sum(out["hm"] ** 2)

    grads = jax.jit(jax.grad(loss))(v["params"])
    # DCN offset-branch params exist and receive gradient signal structure
    flat = jax.tree_util.tree_leaves_with_path(grads)
    dcn_grads = [g for p, g in flat if "conv_offset_mask" in str(p)]
    assert len(dcn_grads) > 0
    # trunk gradients are nonzero
    total = sum(float(jnp.abs(g).sum()) for _, g in flat)
    assert np.isfinite(total) and total > 0
