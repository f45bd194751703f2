"""GSPMD spatial sharding of the conv grid (SURVEY.md §5.7): a forward with
image rows sharded over a 'spatial' mesh axis must match the replicated
forward — XLA inserts the conv halo exchanges."""

import jax
import jax.numpy as jnp
import numpy as np

from centerpose_tpu.config import load_config
from centerpose_tpu.models.factory import create_model, init_model
from centerpose_tpu.parallel.mesh import (
    create_mesh_2d,
    replicated,
    spatial_sharding,
)


def test_spatial_sharded_forward_matches_replicated():
    cfg = load_config(opts=[
        "model.name", "res_18", "model.input_res", "128",
        "model.output_res", "32",
    ])
    model = create_model(cfg)
    variables = init_model(model, jax.random.PRNGKey(0), 128)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 128, 128, 3)).astype(np.float32)
    )

    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)

    mesh = create_mesh_2d(2, 4)
    fwd = jax.jit(
        lambda v, x: model.apply(v, x, train=False),
        in_shardings=(replicated(mesh), spatial_sharding(mesh)),
    )
    out = fwd(
        jax.device_put(variables, replicated(mesh)),
        jax.device_put(x, spatial_sharding(mesh)),
    )
    for head in ref:
        np.testing.assert_allclose(
            np.asarray(ref[head]), np.asarray(out[head]), atol=2e-5,
            err_msg=head,
        )
