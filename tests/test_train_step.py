"""Train-step tests: runs on an 8-device mesh, gradients flow, loss drops.

The overfit check is the reference's de-facto "can it learn" integration test
(SURVEY.md §4), shrunk to CI scale: tiny res_18 variant on a fixed synthetic
batch must reduce total loss substantially.

Expensive artifacts (mesh, model, jitted train step, encoded batch) are
module-scoped fixtures so the step compiles once for the whole file.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centerpose_tpu.config import default_config, update_config
from centerpose_tpu.data.encode import encode_example, stack_batch
from centerpose_tpu.data.synthetic import SyntheticPoseDataset
from centerpose_tpu.models.factory import create_model
from centerpose_tpu.parallel.mesh import create_mesh, shard_batch
from centerpose_tpu.train.trainer import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the default tier


def tiny_cfg(batch_size=8):
    return update_config(
        default_config(),
        {
            "model": {"name": "res_18", "input_res": 64, "output_res": 16},
            "train": {"batch_size": batch_size, "lr": 5e-4},
            "dataset": {"max_objs": 8},
        },
    )


def make_batch(cfg, n):
    ds = SyntheticPoseDataset(num_samples=n, img_w=160, img_h=120, max_people=1)
    exs = []
    for i in range(n):
        img, anns = ds.get_raw(i)
        exs.append(encode_example(img, anns, cfg, is_train=False))
    batch = stack_batch(exs)
    batch.pop("c"), batch.pop("s")
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    mesh = create_mesh()
    model = create_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 100, mesh)
    # donate=False: the initial state is reused across tests in this module.
    step = make_train_step(model, cfg, mesh, donate=False)
    batch = shard_batch(make_batch(cfg, 8), mesh)
    return cfg, mesh, model, state, step, batch


def test_train_step_runs_on_mesh_and_reduces_loss(setup):
    cfg, mesh, model, state, step, batch = setup
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices

    state, stats0 = step(state, batch)
    first = float(stats0["loss"])
    assert np.isfinite(first)
    for _ in range(30):
        state, stats = step(state, batch)
    last = float(stats["loss"])
    assert np.isfinite(last)
    # hm focal loss must drop markedly when overfitting one batch
    assert last < first * 0.7, (first, last)
    assert int(state.step) == 31


def test_train_step_batch_is_sharded_state_replicated(setup):
    cfg, mesh, model, state, step, batch = setup
    # batch leading axis split across 8 devices
    assert len(batch["input"].sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in batch["input"].addressable_shards}
    assert shard_shapes == {(1, 64, 64, 3)}
    # params replicated: every shard holds the full array
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert all(s.data.shape == leaf.shape for s in leaf.addressable_shards)


def test_eval_step_does_not_mutate_state(setup):
    cfg, mesh, model, state, step, batch = setup
    ev = make_eval_step(model, cfg, mesh)
    stats = ev(state, batch)
    assert np.isfinite(float(stats["loss"]))


def test_lr_schedule_step_decay():
    from centerpose_tpu.train.trainer import make_lr_schedule

    cfg = update_config(default_config(), {"train": {"lr": 1e-3, "lr_step": (2, 4)}})
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(19)) == pytest.approx(1e-3)
    assert float(sched(20)) == pytest.approx(1e-4)
    assert float(sched(40)) == pytest.approx(1e-5)


def test_grad_accum_equivalence_of_step_count(setup):
    _, mesh, _, _, _, batch = setup
    cfg = update_config(tiny_cfg(), {"train": {"grad_accum": 2}})
    model = create_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 100, mesh)
    step = make_train_step(model, cfg, mesh)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, _ = step(state, batch)  # accum step: params unchanged
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    state, _ = step(state, batch)  # second: applies update
    p2 = jax.tree_util.tree_leaves(state.params)[0]
    assert np.abs(np.asarray(p2 - p0)).max() > 0
