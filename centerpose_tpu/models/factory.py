"""Model factory + parameter init (reference: lib/models/model.py, SURVEY §2 #7).

``create_model(cfg)`` maps an architecture name to a Flax module wired with
the task heads; ``init_model`` builds the initial variable pytree.  Arch names
follow the reference ('res_18', 'res_50', 'dla_34', 'hrnet_w32',
'mobilenetv2', 'mobilenetv3', 'shufflenetv2', 'hardnet', 'darknet',
'efficientnet') so experiment YAMLs stay auditable.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from centerpose_tpu.config import Config


def _make_resnet(cfg: Config, num_layers: int, bn_axis_name):
    from centerpose_tpu.models.resnet import PoseResNet

    return PoseResNet(
        num_layers=num_layers,
        heads=cfg.model.heads(),
        head_conv=cfg.model.head_conv,
        bn_axis_name=bn_axis_name,
        dtype=_dtype(cfg),
    )


def _dtype(cfg: Config):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.model.compute_dtype]


def _bn_axis(cfg: Config):
    # Always None: the SPMD train step computes BN statistics over the global
    # batch by construction (see config.TrainConfig BatchNorm note), so there
    # is no named axis to pmean over — and under plain jit an axis_name would
    # fail at trace time.  The bn_axis_name module fields remain for future
    # shard_map use.
    return None


MODEL_FACTORY = {}


def register_model(name: str):
    def deco(fn):
        MODEL_FACTORY[name] = fn
        return fn

    return deco


@register_model("res_18")
def _res18(cfg):
    return _make_resnet(cfg, 18, _bn_axis(cfg))


@register_model("res_34")
def _res34(cfg):
    return _make_resnet(cfg, 34, _bn_axis(cfg))


@register_model("res_50")
def _res50(cfg):
    return _make_resnet(cfg, 50, _bn_axis(cfg))


@register_model("res_101")
def _res101(cfg):
    return _make_resnet(cfg, 101, _bn_axis(cfg))


@register_model("res_152")
def _res152(cfg):
    return _make_resnet(cfg, 152, _bn_axis(cfg))


@register_model("dla_34")
def _dla34(cfg):
    from centerpose_tpu.models.dla import DLASeg

    return DLASeg(
        heads=cfg.model.heads(),
        head_conv=cfg.model.head_conv,
        bn_axis_name=_bn_axis(cfg),
        dcn_impl=cfg.model.dcn_impl,
        dcn_max_dy=cfg.model.dcn_max_dy,
        dcn_fused_om=cfg.model.dcn_fused_om,
        dcn_chsec=cfg.model.dcn_chsec,
        dtype=_dtype(cfg),
    )


@register_model("hrnet_w32")
def _hrnet32(cfg):
    from centerpose_tpu.models.hrnet import PoseHighResolutionNet

    return PoseHighResolutionNet(
        width=32,
        heads=cfg.model.heads(),
        head_conv=cfg.model.head_conv,
        bn_axis_name=_bn_axis(cfg),
        dtype=_dtype(cfg),
    )


@register_model("hrnet_w48")
def _hrnet48(cfg):
    from centerpose_tpu.models.hrnet import PoseHighResolutionNet

    return PoseHighResolutionNet(
        width=48,
        heads=cfg.model.heads(),
        head_conv=cfg.model.head_conv,
        bn_axis_name=_bn_axis(cfg),
        dtype=_dtype(cfg),
    )


@register_model("mobilenetv2")
def _mbv2(cfg):
    from centerpose_tpu.models.mobilenet import PoseMobileNetV2

    return PoseMobileNetV2(
        heads=cfg.model.heads(),
        head_conv=cfg.model.head_conv,
        bn_axis_name=_bn_axis(cfg),
        dtype=_dtype(cfg),
    )


@register_model("mobilenetv3")
def _mbv3(cfg):
    from centerpose_tpu.models.mobilenet import PoseMobileNetV3

    return PoseMobileNetV3(
        heads=cfg.model.heads(),
        head_conv=cfg.model.head_conv,
        bn_axis_name=_bn_axis(cfg),
        dtype=_dtype(cfg),
    )


@register_model("shufflenetv2")
def _shuffle(cfg):
    from centerpose_tpu.models.shufflenet import PoseShuffleNetV2

    return PoseShuffleNetV2(
        heads=cfg.model.heads(),
        head_conv=cfg.model.head_conv,
        bn_axis_name=_bn_axis(cfg),
        dtype=_dtype(cfg),
    )


@register_model("hardnet")
def _hardnet(cfg):
    from centerpose_tpu.models.hardnet import PoseHardNet

    return PoseHardNet(
        heads=cfg.model.heads(),
        head_conv=cfg.model.head_conv,
        bn_axis_name=_bn_axis(cfg),
        dtype=_dtype(cfg),
    )


@register_model("darknet")
def _darknet(cfg):
    from centerpose_tpu.models.darknet import PoseDarknet

    return PoseDarknet(
        heads=cfg.model.heads(),
        head_conv=cfg.model.head_conv,
        bn_axis_name=_bn_axis(cfg),
        dtype=_dtype(cfg),
    )


@register_model("efficientnet")
def _effnet(cfg):
    from centerpose_tpu.models.efficientnet import PoseEfficientNet

    return PoseEfficientNet(
        heads=cfg.model.heads(),
        head_conv=cfg.model.head_conv,
        bn_axis_name=_bn_axis(cfg),
        dtype=_dtype(cfg),
    )


def create_model(cfg: Config) -> nn.Module:
    name = cfg.model.name
    if name not in MODEL_FACTORY:
        raise KeyError(f"unknown arch '{name}'; have {sorted(MODEL_FACTORY)}")
    return MODEL_FACTORY[name](cfg)


def init_model(
    model: nn.Module, rng: jax.Array, input_res: int, batch: int = 1
) -> Dict[str, Any]:
    """Initialize {params, batch_stats} with a dummy NHWC input.

    On accelerator backends the init is jitted: eager init dispatches
    hundreds of tiny ops (over a tunnel on remote TPU — minutes for DLA-34);
    one compiled init runs in seconds.  On CPU (tests) eager init is faster
    than compiling the giant init graph, so it stays eager there.
    """
    dummy = jnp.zeros((batch, input_res, input_res, 3), jnp.float32)
    if jax.default_backend() == "cpu":
        return model.init(rng, dummy, train=False)
    return jax.jit(model.init, static_argnames="train")(rng, dummy, train=False)
