import time, json
import numpy as np
import jax, jax.numpy as jnp
from centerpose_tpu.config import default_config, update_config
from centerpose_tpu.models.factory import create_model, init_model

def bench_fwd(arch, dtype, batch=8, res=512, dcn_impl="xla"):
    cfg = update_config(default_config(), {"model": {
        "name": arch, "input_res": res, "output_res": res // 4,
        "head_conv": 256, "compute_dtype": dtype, "dcn_impl": dcn_impl}})
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
    print(json.dumps({"arch": arch, "dtype": dtype, "dcn": dcn_impl,
                      "ms": round(dt/iters*1000, 2), "img_per_s": round(batch*iters/dt, 1)}), flush=True)

def bench_dcn_site(cin, cout, hw, batch=8):
    from centerpose_tpu.ops.dcn_pallas import dcn_v2_pallas
    from centerpose_tpu.ops.dcn import dcn_v2_patch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, hw, hw, cin)).astype(np.float32))
    off = jnp.asarray(0.5*rng.normal(size=(batch, hw, hw, 18)).astype(np.float32))
    m = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(batch, hw, hw, 9)).astype(np.float32)))
    w = jnp.asarray((rng.normal(size=(3, 3, cin, cout))*0.05).astype(np.float32))
    b = jnp.zeros((cout,))
    for name, fn in [("pallas", jax.jit(dcn_v2_pallas)), ("xla", jax.jit(lambda *a: dcn_v2_patch(*a)))]:
        try:
            np.asarray(fn(x, off, m, w, b))
            iters = 30
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(x, off, m, w, b)
            np.asarray(r)
            ms = (time.perf_counter()-t0)/iters*1000
            print(json.dumps({"site": f"{cin}->{cout}@{hw}", "impl": name, "ms": round(ms, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"site": f"{cin}->{cout}@{hw}", "impl": name, "error": str(e)[:120]}), flush=True)

bench_fwd("dla_34", "bfloat16", dcn_impl="xla")
for site in [(512,256,16),(256,256,32),(256,128,32),(128,128,64),(128,64,64),(64,64,128)]:
    bench_dcn_site(*site)
