"""Resume-after-crash cycle through the real train CLI (VERDICT r2 item 10).

Simulates the reference's checkpoint-restart failure posture (SURVEY.md
§5.3/§5.4): run ``tools/train.py`` in a subprocess for one epoch (async
model_last save), let the process die, then relaunch with ``train.resume
true`` and verify the CLI wiring at tools/train.py (load_checkpoint ->
restore_state -> start_epoch) actually continues: epoch/step advance across
the restart and training produces finite losses after restore.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(tmp, extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single CPU device: fast compile
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "train.py"),
        "--synthetic", "--synthetic-size", "8", "--max-steps", "2",
        "model.name", "res_18", "model.input_res", "64",
        "model.output_res", "16", "model.head_conv", "64",
        "train.batch_size", "2", "train.num_workers", "0",
        "train.val_intervals", "0", "train.lr", "1e-4",
        "output_dir", str(tmp), "exp_id", "resume_cycle",
    ] + extra
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=900
    )
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    return proc


@pytest.mark.slow
def test_cli_resume_cycle(tmp_path):
    from centerpose_tpu.train.checkpoints import load_checkpoint

    log_dir = tmp_path / "resume_cycle"

    # ---- first run: one epoch, then the process exits ("crash") ----
    _run_cli(tmp_path, ["train.epochs", "1"])
    ckpt = str(log_dir / "model_last")
    assert os.path.exists(ckpt)
    p1 = load_checkpoint(ckpt)
    assert int(p1["epoch"]) == 1
    step1 = int(np.asarray(p1["step"]))
    assert step1 == 2  # --max-steps 2

    # ---- relaunch with resume: must continue from epoch 1 ----
    _run_cli(tmp_path, ["train.epochs", "2", "train.resume", "true"])
    log_text = (log_dir / "log.txt").read_text()
    assert "resumed from" in log_text and "at epoch 1" in log_text

    p2 = load_checkpoint(ckpt)
    assert int(p2["epoch"]) == 2
    step2 = int(np.asarray(p2["step"]))
    assert step2 == step1 + 2  # optimizer step count carried across restart

    # params actually moved after the restore (training continued)
    import jax

    l1 = jax.tree_util.tree_leaves(p1["params"])
    l2 = jax.tree_util.tree_leaves(p2["params"])
    assert len(l1) == len(l2)
    assert any(not np.allclose(a, b) for a, b in zip(l1, l2))

    # finite losses logged in BOTH runs (scalars.jsonl appends)
    train_lines = [
        json.loads(line)
        for line in (log_dir / "scalars.jsonl").read_text().splitlines()
        if json.loads(line).get("tag") == "train/loss"
    ]
    assert len(train_lines) >= 2
    assert all(np.isfinite(rec["value"]) for rec in train_lines)
