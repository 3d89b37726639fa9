"""LL4AL CIFAR classification demo (reference ll4al/ package, SURVEY.md §2.2
'll4al CIFAR resnet' + §2.3 'll4al/config'): CIFAR ResNet-18 + LossNet active
learning with jitted fused train/eval/score steps."""

from cald_tpu.cifar.data import (
    augment_batch,
    load_cifar10,
    normalize,
    synthetic_cifar,
)
from cald_tpu.cifar.driver import CifarALConfig, CifarLL4AL, al_cifar_loop
from cald_tpu.cifar.resnet import CifarResNet18

__all__ = [
    "CifarResNet18", "CifarALConfig", "CifarLL4AL", "al_cifar_loop",
    "load_cifar10", "synthetic_cifar", "augment_batch", "normalize",
]
