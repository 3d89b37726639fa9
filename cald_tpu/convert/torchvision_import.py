"""torch state_dict -> Flax param tree converters (host-side, numpy only).

Layout mapping for ``ResNetBackbone`` (cald_tpu/models/resnet.py, whose module
names deliberately mirror torchvision):

  torch                         flax params              flax frozen
  conv1.weight              ->  conv1/kernel (HWIO)
  bn1.{weight,bias}         ->                           FrozenBatchNorm_0/{scale,bias}
  bn1.running_{mean,var}    ->                           FrozenBatchNorm_0/{mean,var}
  layerL.B.convK.weight     ->  layer{L}_{B}/convK/kernel
  layerL.B.bnK.*            ->  layer{L}_{B}/FrozenBatchNorm_{K-1}/*
  layerL.B.downsample.0/1   ->  layer{L}_{B}/downsample_conv + FrozenBatchNorm_3
"""

from __future__ import annotations

import numpy as np


def torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _bn(frozen_dst: dict, torch_sd: dict, torch_prefix: str):
    frozen_dst["scale"] = np.asarray(torch_sd[f"{torch_prefix}.weight"], np.float32)
    frozen_dst["bias"] = np.asarray(torch_sd[f"{torch_prefix}.bias"], np.float32)
    frozen_dst["mean"] = np.asarray(torch_sd[f"{torch_prefix}.running_mean"], np.float32)
    frozen_dst["var"] = np.asarray(torch_sd[f"{torch_prefix}.running_var"], np.float32)


def load_resnet50_imagenet(state_dict: dict, params: dict, frozen: dict,
                           blocks_per_stage=(3, 4, 6, 3)):
    """Fill a ResNetBackbone (norm='frozen') variables pair from a torchvision
    resnet50 state_dict. Returns (params, frozen) as NEW trees; shapes are
    validated leaf by leaf.

    ``params``/``frozen`` are the backbone SUB-trees
    (variables['params']['backbone'] etc. when nested in a detector).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    import copy

    p = copy.deepcopy(params)
    f = copy.deepcopy(frozen)

    def set_conv(dst: dict, key: str, torch_name: str):
        w = torch_conv_to_flax(sd[torch_name])
        if dst[key]["kernel"].shape != w.shape:
            raise ValueError(f"{torch_name}: shape {w.shape} != "
                             f"{dst[key]['kernel'].shape}")
        dst[key]["kernel"] = w

    set_conv(p, "conv1", "conv1.weight")
    _bn(f["FrozenBatchNorm_0"], sd, "bn1")

    for stage, n_blocks in enumerate(blocks_per_stage):
        for b in range(n_blocks):
            name = f"layer{stage + 1}_{b}"
            t = f"layer{stage + 1}.{b}"
            for k in range(1, 4):
                set_conv(p[name], f"conv{k}", f"{t}.conv{k}.weight")
                _bn(f[name][f"FrozenBatchNorm_{k - 1}"], sd, f"{t}.bn{k}")
            if f"{t}.downsample.0.weight" in sd:
                set_conv(p[name], "downsample_conv", f"{t}.downsample.0.weight")
                _bn(f[name]["FrozenBatchNorm_3"], sd, f"{t}.downsample.1")
    return p, f


def load_mobilenetv3_imagenet(state_dict: dict, params: dict, frozen: dict):
    """Fill a MobileNetV3Backbone (norm='frozen') variables pair from a
    torchvision ``mobilenet_v3_large`` ImageNet state_dict.

    torchvision layout (/root/reference/detection/mobilenetv3.py:94-180):
      features.0.{0,1}            stem ConvBNActivation
      features.{i+1}.block.{j}    InvertedResidual sub-blocks, in order
                                  [expand?, depthwise, SE?, project]; SE keys
                                  are fc1/fc2 Conv2d-1x1 with bias
      features.16.{0,1}           final 960-ch ConvBNActivation
      classifier.*                dropped (detection uses the trunk only)

    torchvision's mobilenet BN eps is 1e-3 (mobilenetv3.py:161) while
    FrozenBatchNorm here uses 1e-5, so the eps delta is folded into the stored
    variance: scale/sqrt((var+Δ)+1e-5) == scale/sqrt(var+1e-3).
    """
    from cald_tpu.models.mobilenetv3 import LARGE_CFG

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    import copy

    p = copy.deepcopy(params)
    f = copy.deepcopy(frozen)
    eps_delta = 1e-3 - 1e-5

    def set_conv(dst: dict, torch_name: str, *, bias: bool = False):
        w = torch_conv_to_flax(sd[f"{torch_name}.weight"])
        if dst["kernel"].shape != w.shape:
            raise ValueError(f"{torch_name}: shape {w.shape} != "
                             f"{dst['kernel'].shape}")
        dst["kernel"] = w
        if bias:
            dst["bias"] = np.asarray(sd[f"{torch_name}.bias"], np.float32)

    def set_bn(dst: dict, torch_prefix: str):
        _bn(dst, sd, torch_prefix)
        dst["var"] = dst["var"] + eps_delta

    set_conv(p["stem"], "features.0.0")
    set_bn(f["FrozenBatchNorm_0"], "features.0.1")

    for i, cfg in enumerate(LARGE_CFG):
        name, t = f"block{i}", f"features.{i + 1}.block"
        j = bn = 0
        if cfg.expand != cfg.in_ch:
            set_conv(p[name]["expand"], f"{t}.{j}.0")
            set_bn(f[name][f"FrozenBatchNorm_{bn}"], f"{t}.{j}.1")
            j, bn = j + 1, bn + 1
        # depthwise: torch (E,1,k,k) groups=E -> flax HWIO (k,k,1,E)
        set_conv(p[name]["depthwise"], f"{t}.{j}.0")
        set_bn(f[name][f"FrozenBatchNorm_{bn}"], f"{t}.{j}.1")
        j, bn = j + 1, bn + 1
        if cfg.se:
            set_conv(p[name]["se"]["fc1"], f"{t}.{j}.fc1", bias=True)
            set_conv(p[name]["se"]["fc2"], f"{t}.{j}.fc2", bias=True)
            j += 1
        set_conv(p[name]["project"], f"{t}.{j}.0")
        set_bn(f[name][f"FrozenBatchNorm_{bn}"], f"{t}.{j}.1")

    set_conv(p["lastconv"], "features.16.0")
    set_bn(f["FrozenBatchNorm_1"], "features.16.1")
    return p, f


def _backbone_kind(params: dict) -> str:
    """Sniff which converter a backbone param sub-tree needs."""
    if "conv1" in params and "layer1_0" in params:
        return "resnet50"
    if "stem" in params and "block0" in params:
        return "mobilenetv3"
    raise ValueError(f"unrecognized backbone param tree: {sorted(params)[:8]}")


def load_backbone_into_variables(variables: dict, state_dict: dict,
                                 backbone_key: str = "backbone") -> dict:
    """Convenience: returns a new full variables dict with the backbone swapped
    for converted torchvision weights (ResNet-50 or MobileNetV3-Large,
    auto-detected from the param tree)."""
    bb = variables["params"][backbone_key]
    loader = (load_resnet50_imagenet if _backbone_kind(bb) == "resnet50"
              else load_mobilenetv3_imagenet)
    p, f = loader(state_dict, bb, variables["frozen"][backbone_key])
    new = {
        "params": {**variables["params"], backbone_key: p},
        "frozen": {**variables["frozen"], backbone_key: f},
    }
    for k in variables:
        if k not in new:
            new[k] = variables[k]
    return new


def load_pretrained_backbone(variables: dict, path: str,
                             backbone_key: str = "backbone") -> dict:
    """End-to-end: read a torchvision ImageNet checkpoint (``.pth``/``.npz``)
    and return variables with the backbone replaced. This is the TPU analog of
    ``pretrained_backbone=True`` in the reference constructors
    (/root/reference/detection/frcnn_la.py:283, retinanet_cal.py:617,685)."""
    from cald_tpu.convert.pth_reader import load_state_dict

    return load_backbone_into_variables(variables, load_state_dict(path),
                                        backbone_key=backbone_key)
