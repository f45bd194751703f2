"""Deployment-export tests (tools/export.py; reference tools/convert* —
SURVEY.md §2 #29): StableHLO serialize/deserialize round-trip must preserve
the inference function bit-exactly, and AOT lowering must compile.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from centerpose_tpu.config import default_config, update_config
from centerpose_tpu.inference.detector import Detector

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the default tier



def _load_export_tool():
    path = os.path.join(os.path.dirname(__file__), "..", "tools", "export.py")
    spec = importlib.util.spec_from_file_location("export_tool", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def tiny_cfg():
    return update_config(
        default_config(),
        {"model": {"name": "res_18", "input_res": 64, "output_res": 16}},
    )


def test_stablehlo_round_trip(tmp_path):
    from jax import export as jexport

    cfg = tiny_cfg()
    det = Detector(cfg)

    def serve(images):
        return det._process_raw(det.variables, images)

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(np.float32)
    )
    direct = np.asarray(jax.jit(serve)(x))

    exported = jexport.export(jax.jit(serve))(
        jax.ShapeDtypeStruct(x.shape, x.dtype)
    )
    blob = exported.serialize()
    p = tmp_path / "tiny.shlo"
    p.write_bytes(blob)

    rt = jexport.deserialize(p.read_bytes())
    restored = np.asarray(rt.call(x))
    assert restored.shape == (1, cfg.test.topk, 40)
    np.testing.assert_allclose(restored, direct, rtol=1e-6, atol=1e-6)


def test_export_cli_stablehlo(tmp_path, monkeypatch, capsys):
    tool = _load_export_tool()
    out = str(tmp_path / "res18.shlo")
    monkeypatch.setattr(
        sys, "argv",
        ["export.py", "--format", "stablehlo", "--out", out, "--batch", "1",
         "model.name", "res_18", "model.input_res", "64",
         "model.output_res", "16"],
    )
    tool.main()
    assert os.path.exists(out) and os.path.getsize(out) > 1000
    assert "round-trip OK" in capsys.readouterr().out

    # reload path
    monkeypatch.setattr(sys, "argv", ["export.py", "--load", out])
    tool.main()
    assert "ran on" in capsys.readouterr().out


def test_export_cli_aot(monkeypatch, capsys):
    tool = _load_export_tool()
    monkeypatch.setattr(
        sys, "argv",
        ["export.py", "--format", "aot", "--batch", "1",
         "model.name", "res_18", "model.input_res", "64",
         "model.output_res", "16"],
    )
    tool.main()
    assert "executed OK" in capsys.readouterr().out
