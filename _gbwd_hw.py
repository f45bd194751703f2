import time
import numpy as np
import jax, jax.numpy as jnp
import centerpose_tpu.ops.dcn_pallas as dp
from centerpose_tpu.ops.dcn import dcn_v2

for (hw, cin, cout) in [(64, 128, 128), (32, 256, 256), (64, 128, 64), (32, 512, 256)]:
    if not dp._grouped_bwd_ok(hw, hw, cin, cout):
        print(f"{cin}->{cout}@{hw}: not eligible", flush=True); continue
    b = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b,hw,hw,cin)).astype(np.float32))
    off = jnp.asarray((rng.normal(size=(b,hw,hw,18))*2.0).astype(np.float32))
    mask = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(b,hw,hw,9)).astype(np.float32)))
    wt = jnp.asarray((rng.normal(size=(3,3,cin,cout))/np.sqrt(9*cin)).astype(np.float32))
    bb = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(b,hw,hw,cout)).astype(np.float32))
    def clamp_y(o):
        oo = o.reshape(b,hw,hw,9,2)
        return jnp.stack([jnp.clip(oo[...,0],-4.,4.), oo[...,1]],-1).reshape(b,hw,hw,18)
    _, vjp_k = jax.vjp(lambda *a: dp.dcn_v2_pallas(*a, 1, 1, 1, 1, True), x, off, mask, wt, bb)
    _, vjp_x = jax.vjp(lambda x,o,m,w_,b_: dcn_v2(x, clamp_y(o), m, w_, b_), x, off, mask, wt, bb)
    gk = jax.tree_util.tree_map(np.asarray, vjp_k(ct))
    gx = jax.tree_util.tree_map(np.asarray, vjp_x(ct))
    errs = []
    for name, a, c in zip(("dx","doff","dmask","dw","db"), gk, gx):
        d = np.abs(a-c); rel = d.max()/max(np.abs(c).max(),1e-6)
        nbad = int((d > 0.01*np.abs(c).max()).sum())
        errs.append(f"{name} {rel:.4f}({nbad})")
    f = jax.jit(lambda x,o,m,w_,b_,ct: sum(g.sum() for g in jax.vjp(
        lambda *a: dp.dcn_v2_pallas(*a, 1, 1, 1, 1, True), x, o, m, w_, b_)[1](ct)))
    np.asarray(f(x, off, mask, wt, bb, ct))
    t0 = time.perf_counter(); iters = 15
    for _ in range(iters): r = f(x, off, mask, wt, bb, ct)
    np.asarray(r)
    ms = round((time.perf_counter()-t0)/iters*1e3, 2)
    print(f"{cin}->{cout}@{hw}: bwd {ms} ms | " + " ".join(errs), flush=True)
