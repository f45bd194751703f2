"""Two-process distributed data parallelism on CPU (VERDICT r3 item 4).

Covers the multi-PROCESS branches that the virtual 8-device mesh cannot:
``jax.distributed.initialize`` rendezvous, per-process loader sharding
(``shard_id=jax.process_index()``), and ``shard_batch``'s
``make_array_from_process_local_data`` path (parallel/mesh.py) — the TPU
analogs of the reference's DDP launch semantics
(`init_process_group('nccl', 'env://')` + DistributedSampler, SURVEY.md §2
#30, §5.8).

Checks, after 2 real train steps through tools-grade loader + trainer code:
1. both processes hold bit-identical replicated params (the SPMD program is
   one global computation);
2. params match a single-process 8-device run on the same global sample set
   (gradients/BN reduce over the global batch, so shard composition must
   not change the math beyond fp reduction order).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    return env


def _run(cmd, env, timeout=600):
    return subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=timeout
    )


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    steps = 2

    # --- 2 processes x 4 local devices (global mesh of 8) ---
    procs = []
    for pid in range(2):
        out = str(tmp_path / f"p{pid}.npz")
        procs.append((out, subprocess.Popen(
            [sys.executable, _WORKER, "--pid", str(pid), "--nprocs", "2",
             "--port", str(port), "--out", out, "--steps", str(steps)],
            env=_env(4), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )))
    logs = []
    for out, p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout)
        assert p.returncode == 0, f"worker failed:\n{stdout}"

    # --- single-process reference: 8 local devices, same global batch ---
    ref_out = str(tmp_path / "ref.npz")
    r = _run(
        [sys.executable, _WORKER, "--pid", "0", "--nprocs", "1",
         "--port", str(port), "--out", ref_out, "--steps", str(steps)],
        env=_env(8), timeout=900,
    )
    assert r.returncode == 0, f"reference failed:\n{r.stdout}\n{r.stderr}"

    p0 = np.load(procs[0][0])
    p1 = np.load(procs[1][0])
    ref = np.load(ref_out)
    assert set(p0.files) == set(p1.files) == set(ref.files)

    # 1. replicated params identical across the two processes
    for k in p0.files:
        np.testing.assert_array_equal(
            p0[k], p1[k], err_msg=f"cross-process divergence at {k}"
        )

    # 2. equal (fp-reduction tolerance) to the single-process run: the
    # epoch permutation is shared, shards interleave it, and batch-mean
    # loss / global-batch BN are order-invariant over the sample set.
    for k in p0.files:
        np.testing.assert_allclose(
            p0[k], ref[k], rtol=2e-3, atol=2e-5,
            err_msg=f"multi-process vs single-process mismatch at {k}",
        )

    # losses per step also agree
    l_mp = json.load(open(procs[0][0] + ".losses.json"))
    l_ref = json.load(open(ref_out + ".losses.json"))
    np.testing.assert_allclose(l_mp, l_ref, rtol=1e-3)
