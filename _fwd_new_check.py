import time
import numpy as np
import jax, jax.numpy as jnp
import centerpose_tpu.ops.dcn_pallas as dp
from centerpose_tpu.ops.dcn import dcn_v2

for (h, w, cin, cout) in [(128, 128, 64, 64)]:
    b = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b,h,w,cin)).astype(np.float32))
    off = jnp.asarray((rng.normal(size=(b,h,w,18))*2.0).astype(np.float32))
    mask = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(b,h,w,9)).astype(np.float32)))
    wt = jnp.asarray((rng.normal(size=(3,3,cin,cout))/np.sqrt(9*cin)).astype(np.float32))
    bb = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    def clamp_y(o):
        oo = o.reshape(b,h,w,9,2)
        return jnp.stack([jnp.clip(oo[...,0],-4.,4.), oo[...,1]],-1).reshape(b,h,w,18)
    out = np.asarray(jax.jit(lambda *a: dp._dcn_pallas_fwd_impl(*a, max_dy=4))(x, off, mask, wt, bb))
    ref = np.asarray(jax.jit(lambda *a: dcn_v2(a[0], clamp_y(a[1]), *a[2:]))(x, off, mask, wt, bb))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    print(f"site {cin}->{cout}@{h}x{w} fwd rel err:", float(rel), flush=True)
    f = jax.jit(lambda *a: dp._dcn_pallas_fwd_impl(*a, max_dy=4).sum())
    np.asarray(f(x, off, mask, wt, bb))
    t0 = time.perf_counter(); iters = 20
    for _ in range(iters): r = f(x, off, mask, wt, bb)
    np.asarray(r)
    print("  fwd ms:", round((time.perf_counter()-t0)/iters*1e3, 2), flush=True)
