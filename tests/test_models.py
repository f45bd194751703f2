"""Backbone shape/forward tests (small inputs for CI speed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centerpose_tpu.config import default_config, update_config
from centerpose_tpu.models.factory import create_model, init_model

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the default tier



def tiny_cfg(arch, head_conv=64):
    return update_config(
        default_config(),
        {
            "model": {
                "name": arch,
                "input_res": 64,
                "output_res": 16,
                "head_conv": head_conv,
            }
        },
    )


HEAD_SHAPES = {
    "hm": 1,
    "wh": 2,
    "hps": 34,
    "reg": 2,
    "hm_hp": 17,
    "hp_offset": 2,
}


def check_arch(arch, head_conv=64):
    cfg = tiny_cfg(arch, head_conv)
    model = create_model(cfg)
    variables = init_model(model, jax.random.PRNGKey(0), cfg.model.input_res)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = model.apply(variables, x, train=False)
    for name, ch in HEAD_SHAPES.items():
        assert out[name].shape == (2, 16, 16, ch), (arch, name, out[name].shape)
        assert np.all(np.isfinite(np.asarray(out[name])))
    # heatmap bias init: raw logits around -2.19 on a zero input
    hm_mean = float(np.mean(np.asarray(out["hm"])))
    assert -4.0 < hm_mean < 0.0
    return model, variables, out


def test_res18_forward():
    check_arch("res_18")


def test_res50_forward():
    check_arch("res_50")


def test_hrnet_w32_forward():
    check_arch("hrnet_w32")


def test_mobilenetv2_forward():
    check_arch("mobilenetv2")


def test_mobilenetv3_forward():
    check_arch("mobilenetv3")


def test_shufflenetv2_forward():
    check_arch("shufflenetv2")


def test_hardnet_forward():
    check_arch("hardnet")


def test_darknet_forward():
    check_arch("darknet")


def test_efficientnet_forward():
    check_arch("efficientnet")


def test_res18_train_mode_updates_batch_stats():
    cfg = tiny_cfg("res_18")
    model = create_model(cfg)
    variables = init_model(model, jax.random.PRNGKey(0), cfg.model.input_res)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    # running stats must move away from init
    leaves_old = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves_new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    diffs = [float(np.abs(np.asarray(a - b)).max()) for a, b in zip(leaves_old, leaves_new)]
    assert max(diffs) > 0.0
