"""torchvision -> Flax weight conversion tests (uses torch-cpu to build a
synthetic state_dict with torchvision resnet50 naming)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cald_tpu.convert import load_resnet50_imagenet, torch_conv_to_flax  # noqa: E402
from cald_tpu.models.resnet import ResNetBackbone  # noqa: E402


def _fake_torchvision_sd(rng):
    """Minimal resnet50-shaped state_dict with torchvision names."""
    sd = {}

    def conv(name, cout, cin, k):
        # kaiming-ish scale so activations stay finite through all 50 layers
        std = (2.0 / (cin * k * k)) ** 0.5
        sd[name + ".weight"] = torch.tensor(
            (std * rng.normal(size=(cout, cin, k, k))).astype(np.float32))

    def bn(name, c):
        sd[name + ".weight"] = torch.tensor(rng.normal(size=(c,)).astype(np.float32))
        sd[name + ".bias"] = torch.tensor(rng.normal(size=(c,)).astype(np.float32))
        sd[name + ".running_mean"] = torch.tensor(
            rng.normal(size=(c,)).astype(np.float32))
        sd[name + ".running_var"] = torch.tensor(
            np.abs(rng.normal(size=(c,))).astype(np.float32) + 0.5)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    blocks = (3, 4, 6, 3)
    cin_stage = 64
    for s, n in enumerate(blocks):
        planes = 64 * 2 ** s
        for b in range(n):
            t = f"layer{s + 1}.{b}"
            cin = cin_stage if b == 0 else planes * 4
            conv(f"{t}.conv1", planes, cin, 1)
            bn(f"{t}.bn1", planes)
            conv(f"{t}.conv2", planes, planes, 3)
            bn(f"{t}.bn2", planes)
            conv(f"{t}.conv3", planes * 4, planes, 1)
            bn(f"{t}.bn3", planes * 4)
            if b == 0:
                conv(f"{t}.downsample.0", planes * 4, cin, 1)
                bn(f"{t}.downsample.1", planes * 4)
        cin_stage = planes * 4
    return sd


def test_conv_transpose_layout():
    w = np.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5).astype(np.float32)  # OIHW
    f = torch_conv_to_flax(w)
    assert f.shape == (4, 5, 3, 2)  # HWIO
    np.testing.assert_array_equal(f[1, 2, 0, 1], w[1, 0, 1, 2])


def test_resnet50_import_fills_all_leaves(rng):
    model = ResNetBackbone(blocks_per_stage=(3, 4, 6, 3), width=64, norm="frozen")
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    sd = _fake_torchvision_sd(rng)
    p, f = load_resnet50_imagenet(sd, variables["params"], variables["frozen"])

    # shapes preserved everywhere
    jax.tree.map(lambda a, b: None if a.shape == b.shape else 1 / 0,
                 variables["params"], p)
    # spot-check values round-trip
    np.testing.assert_allclose(
        np.asarray(p["conv1"]["kernel"]),
        torch_conv_to_flax(sd["conv1.weight"].numpy()))
    np.testing.assert_allclose(
        np.asarray(f["layer2_0"]["FrozenBatchNorm_1"]["mean"]),
        sd["layer2.0.bn2.running_mean"].numpy())
    np.testing.assert_allclose(
        np.asarray(p["layer3_0"]["downsample_conv"]["kernel"]),
        torch_conv_to_flax(sd["layer3.0.downsample.0.weight"].numpy()))

    # the converted model must produce different (finite) outputs
    out0 = model.apply(variables, x)
    out1 = model.apply({"params": p, "frozen": f}, x)
    assert np.isfinite(np.asarray(out1["c5"])).all()
    assert float(jnp.abs(out1["c5"] - out0["c5"]).max()) > 0


def test_shape_mismatch_raises(rng):
    model = ResNetBackbone(blocks_per_stage=(3, 4, 6, 3), width=64, norm="frozen")
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    sd = _fake_torchvision_sd(rng)
    sd["conv1.weight"] = torch.zeros((64, 3, 3, 3))  # wrong kernel size
    with pytest.raises(ValueError, match="conv1"):
        load_resnet50_imagenet(sd, variables["params"], variables["frozen"])
