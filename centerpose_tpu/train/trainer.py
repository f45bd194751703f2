"""SPMD training step + state (the L6 orchestration layer, TPU-native).

Replaces the reference's ``BaseTrainer``/``ModelWithLoss``/DDP stack
(SURVEY.md §2 #21, #30) with a single jit-compiled train step over a named
device mesh:

- batch arrives sharded ``P('data')``; params/opt-state are replicated ``P()``;
- the loss is computed over the *global* batch, so ``jax.grad`` under GSPMD
  yields globally-correct gradients with XLA inserting the all-reduce over
  ICI/DCN — no hand-written collectives, no gradient buckets;
- BatchNorm note: under jit/GSPMD the batch statistics are reductions over
  the full (global) batch axis — i.e. we get cross-replica "sync BN" *by
  construction*, which at matched global batch size is at least as good as
  the reference's per-device stats (SURVEY.md §7 hard-part 4; documented
  deviation);
- state donation keeps params/opt-state in place in HBM across steps.

LR schedule mirrors the reference: constant LR with /10 drops at the
``lr_step`` epoch boundaries.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from centerpose_tpu.config import Config
from centerpose_tpu.losses import multi_pose_loss
from centerpose_tpu.parallel.mesh import batch_sharding, replicated


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_lr_schedule(cfg: Config, steps_per_epoch: int) -> optax.Schedule:
    """Step-decay schedule: lr / 10 at each epoch in cfg.train.lr_step.

    (reference: train.py epoch loop LR adjustment, SURVEY.md §3.1.)
    """
    boundaries = {
        int(e) * steps_per_epoch: 0.1 for e in cfg.train.lr_step
    }
    return optax.piecewise_constant_schedule(cfg.train.lr, boundaries)


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    if cfg.train.optimizer == "adam":
        tx = optax.adam(schedule)
    elif cfg.train.optimizer == "sgd":
        tx = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {cfg.train.optimizer}")
    if cfg.train.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.train.grad_accum)
    return tx


def create_train_state(
    cfg: Config,
    model,
    rng: jax.Array,
    steps_per_epoch: int = 1000,
    mesh=None,
) -> TrainState:
    """Init model variables + optimizer; replicate over the mesh if given."""
    from centerpose_tpu.models.factory import init_model

    variables = init_model(model, rng, cfg.model.input_res)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))
    return state


def unpack_batch(batch: Dict[str, jnp.ndarray], cfg: Config) -> Dict[str, jnp.ndarray]:
    """Device-side decode of the compact H2D wire format (train.wire).

    Dtype-driven so mixed loaders just work under one compiled step per
    wire format: a uint8 ``input`` is normalized here (fused into the step,
    the same device-side normalization the Detector uses), and float16
    dense targets are cast back to f32 before the loss.  No-op on the
    reference-style float32 wire."""
    b = dict(batch)
    x = b["input"]
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
        aug = b.pop("aug", None)
        if aug is not None:
            # replay the host-sampled color aug (ops/image.color_aug_coeffs):
            # x' = A*x + c_gs*gs + c_mean*gs_mean + pca, with gs/gs_mean from
            # the PRE-aug image exactly as the host f32 path computes them
            gs = x @ jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
            gs_mean = gs.mean(axis=(1, 2))
            a_tot, c_gs, c_mean = aug[:, 0], aug[:, 1], aug[:, 2]
            x = (
                a_tot[:, None, None, None] * x
                + c_gs[:, None, None, None] * gs[..., None]
                + c_mean[:, None, None, None] * gs_mean[:, None, None, None]
                + aug[:, None, None, 3:6]
            )
        mean = jnp.asarray(cfg.dataset.mean, jnp.float32)
        std = jnp.asarray(cfg.dataset.std, jnp.float32)
        b["input"] = (x - mean) / std
    for k, v in b.items():
        if k != "input" and v.dtype == jnp.float16:
            b[k] = v.astype(jnp.float32)
    return b


def make_train_step(
    model, cfg: Config, mesh=None, donate: bool = True
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted SPMD train step: (state, sharded batch) -> (state, stats)."""

    def loss_fn(params, batch_stats, batch):
        batch = unpack_batch(batch, cfg)
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, mutated = model.apply(
            variables, batch["input"], train=True, mutable=["batch_stats"]
        )
        loss, stats = multi_pose_loss(outputs, batch, cfg)
        return loss, (stats, mutated["batch_stats"])

    def step_fn(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (stats, new_bs)), grads = grad_fn(state.params, state.batch_stats, batch)
        new_state = state.apply_gradients(grads, new_bs)
        return new_state, stats

    kwargs = {}
    if mesh is not None:
        kwargs["in_shardings"] = (replicated(mesh), batch_sharding(mesh))
        kwargs["out_shardings"] = (replicated(mesh), replicated(mesh))
    if donate:
        kwargs["donate_argnums"] = (0,)
    return jax.jit(step_fn, **kwargs)


def make_eval_step(model, cfg: Config, mesh=None):
    """Jitted eval-mode loss (running BN stats, no update)."""

    def step_fn(state: TrainState, batch):
        batch = unpack_batch(batch, cfg)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        outputs = model.apply(variables, batch["input"], train=False)
        _, stats = multi_pose_loss(outputs, batch, cfg)
        return stats

    kwargs = {}
    if mesh is not None:
        kwargs["in_shardings"] = (replicated(mesh), batch_sharding(mesh))
        kwargs["out_shardings"] = replicated(mesh)
    return jax.jit(step_fn, **kwargs)
