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


# ---------------------------------------------------------------------------
# torch-free .pth reader
# ---------------------------------------------------------------------------

def test_pth_reader_roundtrips_torch_save(tmp_path, rng):
    from cald_tpu.convert.pth_reader import load_state_dict

    sd = {
        "w": torch.tensor(rng.normal(size=(4, 3, 3, 3)).astype(np.float32)),
        "mean": torch.tensor(rng.normal(size=(7,)).astype(np.float64)),
        "param": torch.nn.Parameter(torch.ones(2, 5)),
        "count": torch.tensor(42, dtype=torch.int64),
        "half": torch.tensor(rng.normal(size=(6,)).astype(np.float16)),
        "noncontig": torch.tensor(
            rng.normal(size=(6, 4)).astype(np.float32)).t(),
    }
    path = str(tmp_path / "ckpt.pth")
    torch.save(sd, path)
    out = load_state_dict(path)
    assert set(out) == set(sd)
    for k, v in sd.items():
        assert out[k].shape == tuple(v.shape), k
        np.testing.assert_allclose(np.asarray(out[k], np.float64),
                                   v.detach().numpy().astype(np.float64))


def test_pth_reader_unwraps_state_dict_wrapper(tmp_path):
    from cald_tpu.convert.pth_reader import load_state_dict

    path = str(tmp_path / "wrapped.pth")
    torch.save({"state_dict": {"a.weight": torch.zeros(3)}, "epoch": 7}, path)
    out = load_state_dict(path)
    assert list(out) == ["a.weight"]


def test_pth_reader_refuses_arbitrary_globals(tmp_path):
    """The restricted unpickler must reject anything beyond tensor rebuilds —
    loading a checkpoint must never execute arbitrary pickled code."""
    import pickle
    import zipfile

    from cald_tpu.convert.pth_reader import read_pth

    path = str(tmp_path / "evil.pth")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("evil/data.pkl", pickle.dumps({"x": print}))
    with pytest.raises(Exception, match="refusing to unpickle"):
        read_pth(path)


def test_npz_state_dict(tmp_path, rng):
    from cald_tpu.convert.pth_reader import load_state_dict

    path = str(tmp_path / "w.npz")
    np.savez(path, **{"conv1.weight": rng.normal(size=(4, 3, 3, 3))})
    out = load_state_dict(path)
    assert out["conv1.weight"].shape == (4, 3, 3, 3)


# ---------------------------------------------------------------------------
# MobileNetV3-Large converter
# ---------------------------------------------------------------------------

def _fake_mobilenetv3_sd(rng):
    """mobilenet_v3_large-shaped state_dict with torchvision names
    (/root/reference/detection/mobilenetv3.py:94-180)."""
    from cald_tpu.models.mobilenetv3 import LARGE_CFG, _make_divisible

    sd = {}

    def conv(name, cout, cin, k, bias=False):
        std = (2.0 / max(cin * k * k, 1)) ** 0.5
        sd[name + ".weight"] = torch.tensor(
            (std * rng.normal(size=(cout, cin, k, k))).astype(np.float32))
        if bias:
            sd[name + ".bias"] = torch.tensor(
                rng.normal(size=(cout,)).astype(np.float32))

    def bn(name, c):
        sd[name + ".weight"] = torch.tensor(
            np.abs(rng.normal(size=(c,))).astype(np.float32) + 0.5)
        sd[name + ".bias"] = torch.tensor(rng.normal(size=(c,)).astype(np.float32))
        sd[name + ".running_mean"] = torch.tensor(
            rng.normal(size=(c,)).astype(np.float32))
        sd[name + ".running_var"] = torch.tensor(
            np.abs(rng.normal(size=(c,))).astype(np.float32) + 0.5)

    conv("features.0.0", 16, 3, 3)
    bn("features.0.1", 16)
    for i, c in enumerate(LARGE_CFG):
        t, j = f"features.{i + 1}.block", 0
        if c.expand != c.in_ch:
            conv(f"{t}.{j}.0", c.expand, c.in_ch, 1)
            bn(f"{t}.{j}.1", c.expand)
            j += 1
        conv(f"{t}.{j}.0", c.expand, 1, c.kernel)  # depthwise, groups=expand
        bn(f"{t}.{j}.1", c.expand)
        j += 1
        if c.se:
            sq = _make_divisible(c.expand // 4)
            conv(f"{t}.{j}.fc1", sq, c.expand, 1, bias=True)
            conv(f"{t}.{j}.fc2", c.expand, sq, 1, bias=True)
            j += 1
        conv(f"{t}.{j}.0", c.out_ch, c.expand, 1)
        bn(f"{t}.{j}.1", c.out_ch)
    conv("features.16.0", 960, 160, 1)
    bn("features.16.1", 960)
    return sd


def test_mobilenetv3_import_fills_all_leaves(rng):
    from cald_tpu.convert.torchvision_import import load_mobilenetv3_imagenet
    from cald_tpu.models.mobilenetv3 import MobileNetV3Backbone

    model = MobileNetV3Backbone(returned=("c5",), norm="frozen")
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    sd = _fake_mobilenetv3_sd(rng)
    p, f = load_mobilenetv3_imagenet(sd, variables["params"], variables["frozen"])

    jax.tree.map(lambda a, b: None if a.shape == b.shape else 1 / 0,
                 variables["params"], p)
    jax.tree.map(lambda a, b: None if a.shape == b.shape else 1 / 0,
                 variables["frozen"], f)
    # spot-check a depthwise kernel (torch (E,1,k,k) -> flax (k,k,1,E))
    np.testing.assert_allclose(
        np.asarray(p["block1"]["depthwise"]["kernel"]),
        torch_conv_to_flax(sd["features.2.block.1.0.weight"].numpy()))
    # SE bias round-trips
    np.testing.assert_allclose(
        np.asarray(p["block3"]["se"]["fc1"]["bias"]),
        sd["features.4.block.2.fc1.bias"].numpy())
    # BN eps folding: frozen var carries the (1e-3 - 1e-5) delta so the
    # normalization equals torchvision's eps=1e-3 formula
    tv_var = sd["features.0.1.running_var"].numpy()
    np.testing.assert_allclose(np.asarray(f["FrozenBatchNorm_0"]["var"]),
                               tv_var + (1e-3 - 1e-5), rtol=1e-6)

    out = model.apply({"params": p, "frozen": f}, x)
    assert np.isfinite(np.asarray(out["c5"])).all()


def test_mobilenetv3_bn_matches_torch_eps(rng):
    """One converted FrozenBatchNorm must equal torch BN eval math at eps=1e-3."""
    from cald_tpu.convert.torchvision_import import load_mobilenetv3_imagenet
    from cald_tpu.models.mobilenetv3 import MobileNetV3Backbone

    model = MobileNetV3Backbone(returned=("c0",), norm="frozen")
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    sd = _fake_mobilenetv3_sd(rng)
    _, f = load_mobilenetv3_imagenet(sd, variables["params"], variables["frozen"])
    g = f["FrozenBatchNorm_0"]
    x = rng.normal(size=(16,)).astype(np.float32)
    ours = (x - g["mean"]) * g["scale"] / np.sqrt(g["var"] + 1e-5) + g["bias"]
    w, b = sd["features.0.1.weight"].numpy(), sd["features.0.1.bias"].numpy()
    m, v = (sd["features.0.1.running_mean"].numpy(),
            sd["features.0.1.running_var"].numpy())
    theirs = (x - m) / np.sqrt(v + 1e-3) * w + b
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end: .pth file -> detector variables (reference pretrained_backbone=True)
# ---------------------------------------------------------------------------

def test_pretrained_backbone_into_faster_rcnn(tmp_path, rng):
    from cald_tpu.convert.torchvision_import import load_pretrained_backbone
    from cald_tpu.models import fasterrcnn_resnet50_fpn_feature

    model = fasterrcnn_resnet50_fpn_feature(num_classes=21)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 128, 128, 3)),
        jnp.full((1, 2), 128, jnp.int32))
    path = str(tmp_path / "resnet50.pth")
    torch.save(_fake_torchvision_sd(rng), path)
    new = load_pretrained_backbone(variables, path)

    sd = _fake_torchvision_sd(rng)  # same rng state NOT reused; reload file
    from cald_tpu.convert.pth_reader import load_state_dict

    disk = load_state_dict(path)
    np.testing.assert_allclose(
        np.asarray(new["params"]["backbone"]["conv1"]["kernel"]),
        torch_conv_to_flax(disk["conv1.weight"]))
    # non-backbone params untouched
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 {k: v for k, v in variables["params"].items() if k != "backbone"},
                 {k: v for k, v in new["params"].items() if k != "backbone"})


def test_pretrained_backbone_into_retinanet_mobilenet(tmp_path, rng):
    from cald_tpu.convert.torchvision_import import load_pretrained_backbone
    from cald_tpu.models import retinanet_mobilenet

    model = retinanet_mobilenet(num_classes=21)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 128, 128, 3)),
        jnp.full((1, 2), 128, jnp.int32))
    path = str(tmp_path / "mbv3.pth")
    torch.save(_fake_mobilenetv3_sd(rng), path)
    new = load_pretrained_backbone(variables, path)
    from cald_tpu.convert.pth_reader import load_state_dict

    disk = load_state_dict(path)
    np.testing.assert_allclose(
        np.asarray(new["params"]["backbone"]["stem"]["kernel"]),
        torch_conv_to_flax(disk["features.0.0.weight"]))
