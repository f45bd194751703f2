import time, json
import numpy as np
import jax, jax.numpy as jnp
from centerpose_tpu.config import default_config, update_config
from centerpose_tpu.models.factory import create_model, init_model

def bench_fwd(arch, batch=8, res=512, head_conv=64, dtype="float32"):
    cfg = update_config(default_config(), {"model": {
        "name": arch, "input_res": res, "output_res": res // 4,
        "head_conv": head_conv, "compute_dtype": dtype}})
    model = create_model(cfg)
    variables = init_model(model, jax.random.PRNGKey(0), res)
    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)["hm"]
    x = jnp.asarray(np.random.default_rng(0).normal(size=(batch, res, res, 3)).astype(np.float32))
    np.asarray(fwd(variables, x))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fwd(variables, x)
    np.asarray(r)
    dt = time.perf_counter() - t0
    print(json.dumps({"arch": arch, "batch": batch, "dtype": dtype,
                      "ms": round(dt/iters*1000, 2), "img_per_s": round(batch*iters/dt, 1)}), flush=True)

for arch, hc in [("res_18", 64), ("res_50", 64), ("mobilenetv3", 64), ("hrnet_w32", 64)]:
    bench_fwd(arch, head_conv=hc)
bench_fwd("dla_34", batch=16, head_conv=256)
bench_fwd("res_18", batch=32)
