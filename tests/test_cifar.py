"""LL4AL CIFAR demo tests (reference ll4al/ package)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cald_tpu.cifar import (
    CifarALConfig, CifarResNet18, al_cifar_loop, augment_batch, normalize,
    synthetic_cifar,
)


class TestModel:
    def test_forward_contract(self):
        m = CifarResNet18(num_classes=10, width=8)
        x = jnp.zeros((2, 32, 32, 3))
        v = m.init(jax.random.key(0), x, train=False)
        logits, feats = m.apply(v, x, train=False)
        assert logits.shape == (2, 10)
        # stage outputs at the reference's strides (main.py: out1..out4)
        assert [f.shape[1:] for f in feats] == [
            (32, 32, 8), (16, 16, 16), (8, 8, 32), (4, 4, 64)]

    def test_bn_stats_update_in_train_mode(self):
        m = CifarResNet18(num_classes=10, width=8)
        x = jnp.ones((4, 32, 32, 3)) * 100.0
        v = m.init(jax.random.key(0), x, train=False)
        (_, _), upd = m.apply(v, x, train=True, mutable=["batch_stats"])
        before = jax.tree.leaves(v["batch_stats"])
        after = jax.tree.leaves(upd["batch_stats"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))


class TestData:
    def test_augment_shapes_and_range(self, rng):
        x = jnp.asarray(rng.uniform(0, 255, (4, 32, 32, 3)).astype(np.float32))
        out = augment_batch(x, jax.random.key(0))
        assert out.shape == x.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0

    def test_normalize_reference_constants(self):
        x = jnp.full((1, 2, 2, 3), 255.0)
        n = np.asarray(normalize(x))
        want = (1.0 - np.array([0.4914, 0.4822, 0.4465])) / np.array(
            [0.2023, 0.1994, 0.2010])
        np.testing.assert_allclose(n[0, 0, 0], want, rtol=1e-5)

    def test_load_cifar10_batch_format(self, tmp_path):
        import os
        import pickle

        from cald_tpu.cifar import load_cifar10

        d = tmp_path / "cifar-10-batches-py"
        os.makedirs(d)
        rng = np.random.default_rng(0)
        for name, n in [(f"data_batch_{i}", 4) for i in range(1, 6)] + [
                ("test_batch", 6)]:
            payload = {b"data": rng.integers(0, 256, (n, 3072), np.uint8),
                       b"labels": list(rng.integers(0, 10, n))}
            with open(d / name, "wb") as f:
                pickle.dump(payload, f)
        xtr, ytr, xte, yte = load_cifar10(str(tmp_path))
        assert xtr.shape == (20, 32, 32, 3) and ytr.shape == (20,)
        assert xte.shape == (6, 32, 32, 3) and yte.shape == (6,)


@pytest.mark.slow
def test_al_cifar_loop_learns_and_selects():
    """Mini end-to-end: 2 cycles on trivially learnable synthetic data; test
    accuracy must beat chance comfortably and the labeled set must grow by
    ADDENDUM (ll4al/main.py:219-290 semantics)."""
    xtr, ytr, xte, yte = synthetic_cifar(num_train=512, num_test=128, seed=0)
    cfg = CifarALConfig(
        num_train=512, batch=64, subset=256, addendum=128, trials=1, cycles=2,
        epochs=8, milestones=(6,), epoch_loss=4, width=16, interm_dim=16,
        lr=0.05, seed=0)
    hist = al_cifar_loop(cfg, xtr, ytr, xte, yte, print_fn=lambda *a: None)
    assert [h["labeled"] for h in hist] == [128, 256]
    # measured 82% after cycle 2 (10 classes, trivially separable); margin
    # for backend variance
    assert hist[-1]["acc"] > 50.0
