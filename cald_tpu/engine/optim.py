"""Optimizer construction: SGD(momentum) + weight decay + backbone freezing.

Reference recipe: SGD lr=0.0025, momentum=0.9, weight_decay=1e-4 over
``requires_grad`` params only (/root/reference/cald_train.py:396-399); freezing
is torchvision's trainable_backbone_layers=3 (stem + layer1 frozen). Here
freezing is an optax mask over param paths — frozen leaves get zero updates and
no weight decay, the functional analogue of requires_grad=False.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax


def trainable_mask(params, frozen_prefixes: tuple[str, ...]) -> object:
    """Pytree of bools: False for any leaf whose path starts with one of
    ``frozen_prefixes`` (path segments joined by '/')."""

    def mask_fn(path, _):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        flat = "/".join(str(k) for k in keys)
        return not any(flat.startswith(pref) for pref in frozen_prefixes)

    return jax.tree_util.tree_map_with_path(mask_fn, params)


# torchvision trainable_backbone_layers=3: layer2..layer4 train, conv1/bn1 +
# layer1 frozen (resnet_fpn_backbone). Our module paths:
RESNET_FROZEN_L3 = ("backbone/conv1", "backbone/layer1")


def make_sgd(learning_rate: float | Callable, *, momentum: float = 0.9,
             weight_decay: float = 1e-4, params=None,
             frozen_prefixes: tuple[str, ...] = ()) -> optax.GradientTransformation:
    """SGD with decoupled-style L2 (torch adds wd*p to the gradient — use
    additive weight decay BEFORE momentum, like torch.optim.SGD)."""
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=learning_rate, momentum=momentum, nesterov=False),
    )
    if frozen_prefixes and params is not None:
        mask = trainable_mask(params, frozen_prefixes)
        labels = jax.tree.map(lambda t: "train" if t else "freeze", mask)
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()},
                                   param_labels=labels)
    return tx
