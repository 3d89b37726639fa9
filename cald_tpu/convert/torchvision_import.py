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


def load_backbone_into_variables(variables: dict, state_dict: dict,
                                 backbone_key: str = "backbone") -> dict:
    """Convenience: returns a new full variables dict with the backbone swapped
    for converted torchvision weights."""
    p, f = load_resnet50_imagenet(state_dict,
                                  variables["params"][backbone_key],
                                  variables["frozen"][backbone_key])
    new = {
        "params": {**variables["params"], backbone_key: p},
        "frozen": {**variables["frozen"], backbone_key: f},
    }
    for k in variables:
        if k not in new:
            new[k] = variables[k]
    return new
