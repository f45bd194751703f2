"""Checkpoint utilities: filtered restore, torch-layout import, opt_state
structural checks, async save round-trip."""

import numpy as np
import pytest

from centerpose_tpu.train.checkpoints import (
    _torch_to_flax_layout,
    import_numpy_state_dict,
    restore_params_filtered,
)


def tiny_params():
    return {
        "trunk": {
            "conv1": {"kernel": np.zeros((3, 3, 3, 16), np.float32)},
            "bn1": {"scale": np.ones(16, np.float32), "bias": np.zeros(16, np.float32)},
        },
        "head": {
            "dense": {"kernel": np.zeros((16, 8), np.float32),
                      "bias": np.zeros(8, np.float32)},
        },
    }


def test_torch_layout_conversion():
    # OIHW conv -> HWIO
    conv = np.arange(16 * 3 * 3 * 3, dtype=np.float32).reshape(16, 3, 3, 3)
    out = _torch_to_flax_layout("w", conv, (3, 3, 3, 16))
    assert out.shape == (3, 3, 3, 16)
    np.testing.assert_array_equal(out, np.transpose(conv, (2, 3, 1, 0)))
    # [out, in] linear -> [in, out]
    lin = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
    assert _torch_to_flax_layout("w", lin, (16, 8)).shape == (16, 8)
    # vectors pass through
    v = np.ones(16, np.float32)
    np.testing.assert_array_equal(_torch_to_flax_layout("w", v, (16,)), v)


def test_import_numpy_state_dict_partial():
    params = tiny_params()
    sd = {
        # torch layouts, dotted keys
        "trunk.conv1.kernel": np.full((16, 3, 3, 3), 2.0, np.float32),
        "trunk.bn1.scale": np.full(16, 3.0, np.float32),
        # unknown key: dropped with a warning
        "fc.weight": np.zeros((10, 10), np.float32),
        # shape mismatch: skipped, keeps init
        "head.dense.bias": np.zeros(4, np.float32),
    }
    out = import_numpy_state_dict(params, sd, verbose=False)
    assert float(out["trunk"]["conv1"]["kernel"].mean()) == 2.0
    assert out["trunk"]["conv1"]["kernel"].shape == (3, 3, 3, 16)
    assert float(out["trunk"]["bn1"]["scale"][0]) == 3.0
    # untouched leaves keep init
    np.testing.assert_array_equal(out["head"]["dense"]["bias"],
                                  params["head"]["dense"]["bias"])
    np.testing.assert_array_equal(out["trunk"]["bn1"]["bias"],
                                  params["trunk"]["bn1"]["bias"])


def test_import_key_map():
    params = tiny_params()
    sd = {"backbone.first.weight": np.full((16, 3, 3, 3), 5.0, np.float32)}
    out = import_numpy_state_dict(
        params, sd, key_map={"backbone.first.weight": "trunk/conv1/kernel"},
        verbose=False,
    )
    assert float(out["trunk"]["conv1"]["kernel"].mean()) == 5.0


def test_restore_params_filtered_roundtrip():
    params = tiny_params()
    loaded = {
        "trunk": {
            "conv1": {"kernel": np.ones((3, 3, 3, 16), np.float32)},
            "bn1": {"scale": np.ones(16), "bias": np.ones(16)},
        },
        "head": {
            # wrong shape -> skipped
            "dense": {"kernel": np.ones((4, 4), np.float32),
                      "bias": np.ones(8, np.float32)},
        },
    }
    out = restore_params_filtered(params, loaded, verbose=False)
    assert float(out["trunk"]["conv1"]["kernel"].mean()) == 1.0
    assert out["head"]["dense"]["kernel"].shape == (16, 8)
    assert float(out["head"]["dense"]["kernel"].sum()) == 0.0
    assert float(out["head"]["dense"]["bias"].sum()) == 8.0


def test_restore_state_checks_opt_state(tmp_path):
    import jax
    import optax

    from centerpose_tpu.train.checkpoints import restore_state
    from centerpose_tpu.train.trainer import TrainState

    params = {"w": np.ones((4, 4), np.float32)}
    tx = optax.adam(1e-3)
    state = TrainState(
        step=np.zeros((), np.int32), params=params,
        batch_stats={}, opt_state=tx.init(params), tx=tx,
    )
    good = {
        "step": np.asarray(5),
        "params": params,
        "batch_stats": {},
        "opt_state": jax.device_get(state.opt_state),
    }
    restored = restore_state(state, good)
    assert int(restored.step) == 5

    # different optimizer (sgd+momentum has fewer leaves) must be rejected
    sgd = optax.sgd(1e-3)
    bad = dict(good, opt_state=jax.device_get(sgd.init(params)))
    with pytest.raises(ValueError, match="opt_state mismatch"):
        restore_state(state, bad)


def test_async_save_roundtrip(tmp_path):
    import optax

    from centerpose_tpu.train.checkpoints import (
        load_checkpoint,
        save_checkpoint,
        wait_for_saves,
    )
    from centerpose_tpu.train.trainer import TrainState

    params = {"w": np.full((4, 4), 7.0, np.float32)}
    tx = optax.adam(1e-3)
    state = TrainState(
        step=np.asarray(3, np.int32), params=params,
        batch_stats={"m": np.zeros(4, np.float32)},
        opt_state=tx.init(params), tx=tx,
    )
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, epoch=2, async_save=True)
    wait_for_saves()
    payload = load_checkpoint(path)
    assert int(payload["epoch"]) == 2
    np.testing.assert_array_equal(payload["params"]["w"], params["w"])
