"""Worker process for tests/test_multiprocess_dp.py.

One process of an N-process CPU data-parallel run (N=1 is the single-process
reference).  Exercises the real multi-process branches that a TPU pod uses
(SURVEY.md §5.8; reference analog: DDP `init_process_group('nccl', 'env://')`
+ DistributedSampler):

- ``jax.distributed.initialize`` rendezvous (parallel/mesh.init_distributed);
- per-process loader sharding ``shard_id=jax.process_index()``;
- ``shard_batch``'s ``make_array_from_process_local_data`` branch (each
  process contributes only its local samples; no host sees the global batch).

Writes final params (+ per-step losses) to an .npz for the parent test to
compare across processes and against the single-process run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.nprocs > 1:
        from centerpose_tpu.parallel.mesh import init_distributed

        init_distributed(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.nprocs,
            process_id=args.pid,
        )
    assert jax.process_count() == args.nprocs, jax.process_count()
    # the parent sets XLA_FLAGS=--xla_force_host_platform_device_count=K
    n_local = jax.local_device_count()
    assert jax.device_count() == n_local * args.nprocs

    import numpy as np

    from centerpose_tpu.config import load_config
    from centerpose_tpu.data.loader import DataLoader, prefetch_to_device
    from centerpose_tpu.data.synthetic import SyntheticPoseDataset
    from centerpose_tpu.models.factory import create_model
    from centerpose_tpu.parallel.mesh import create_mesh
    from centerpose_tpu.train.trainer import create_train_state, make_train_step

    global_batch = 8
    # SGD, not adam: the parity check vs the single-process run relies on
    # updates being ~linear in the gradient.  Adam's m/sqrt(v) amplifies
    # fp-reduction-order noise on near-zero gradient coordinates into
    # lr-sized sign flips, which is optimizer sensitivity, not a
    # distribution bug.
    cfg = load_config(opts=[
        "model.name", "res_18", "model.input_res", "64",
        "model.output_res", "16", "dataset.max_objs", "4",
        "train.batch_size", str(global_batch), "train.seed", "7",
        "train.optimizer", "sgd", "train.lr", "0.01",
    ])
    ds = SyntheticPoseDataset(16, seed=1)
    loader = DataLoader(
        ds, cfg, batch_size=global_batch // jax.process_count(),
        is_train=True, num_workers=0, seed=cfg.train.seed,
        shard_id=jax.process_index(), num_shards=jax.process_count(),
    )
    mesh = create_mesh()
    model = create_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 2, mesh)
    step = make_train_step(model, cfg, mesh)

    losses = []
    for i, batch in enumerate(prefetch_to_device(loader.epoch(0), mesh)):
        if i >= args.steps:
            break
        state, stats = step(state, batch)
        losses.append(float(stats["loss"]))
    assert len(losses) == args.steps, losses

    flat = {
        jax.tree_util.keystr(p): np.asarray(jax.device_get(v))
        for p, v in jax.tree_util.tree_flatten_with_path(state.params)[0]
    }
    np.savez(args.out, **flat)
    with open(args.out + ".losses.json", "w") as f:
        json.dump(losses, f)
    print(f"worker {args.pid}/{args.nprocs}: {args.steps} steps, "
          f"losses={losses}", flush=True)


if __name__ == "__main__":
    main()
