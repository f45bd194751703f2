import time, json
import numpy as np
import jax, jax.numpy as jnp

from centerpose_tpu.config import default_config, update_config
from centerpose_tpu.models.factory import create_model, init_model
from centerpose_tpu.losses import sigmoid_clamped
from centerpose_tpu.ops.decode import multi_pose_decode

def bench(arch, dtype, batch=8, res=512, dcn_impl="xla"):
    cfg = update_config(default_config(), {"model": {
        "name": arch, "input_res": res, "output_res": res // 4,
        "head_conv": 256 if arch == "dla_34" else 64,
        "compute_dtype": dtype, "dcn_impl": dcn_impl}})
    model = create_model(cfg)
    variables = init_model(model, jax.random.PRNGKey(0), res)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)["hm"]

    @jax.jit
    def full(v, x):
        out = model.apply(v, x, train=False)
        return multi_pose_decode(
            sigmoid_clamped(out["hm"]), out["wh"], out["hps"], out["reg"],
            sigmoid_clamped(out["hm_hp"]), out["hp_offset"], k=100)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(batch, res, res, 3)).astype(np.float32))
    for name, fn in [("fwd", fwd), ("full", full)]:
        np.asarray(fn(variables, x))
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(variables, x)
        np.asarray(r)
        dt = time.perf_counter() - t0
        print(json.dumps({"arch": arch, "dtype": dtype, "dcn": dcn_impl, "stage": name,
                          "ms_per_batch": round(dt / iters * 1000, 2),
                          "img_per_s": round(batch * iters / dt, 1)}), flush=True)

bench("dla_34", "float32", dcn_impl="xla")
bench("dla_34", "float32", dcn_impl="pallas")
bench("dla_34", "bfloat16", dcn_impl="xla")
bench("dla_34", "bfloat16", dcn_impl="pallas")
