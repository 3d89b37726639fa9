"""Fused Pallas bottleneck-stage parity vs the XLA conv chain (TPU only).

The kernel is OPT-IN (CALD_TPU_PALLAS_BNECK=1; measured at parity with XLA's
convs on v5e, PERF.md round 2) but must stay correct: these tests pin the
folded-weight math, the halo ring (zero 'SAME' padding semantics) and the
two-buffer ping-pong chaining across blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tpu_only = pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                              reason="needs a TPU backend")


def _xla_block(x, w1, b1, w2, b2, w3, b3):
    conv = lambda t, k: jax.lax.conv_general_dilated(
        t, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(conv(x, w1[None, None]) + b1, 0)
    y = jnp.maximum(conv(y, w2) + b2, 0)
    y = conv(y, w3[None, None]) + b3
    return jnp.maximum(y + x, 0)


def _blocks(rng, c, p, n):
    mk = lambda *s: jnp.asarray(rng.normal(0, 0.08, s).astype(np.float32))
    return [(mk(c, p), mk(p), mk(3, 3, p, p), mk(p), mk(p, c), mk(c))
            for _ in range(n)]


@tpu_only
@pytest.mark.parametrize("h,w,c,p,n", [(32, 64, 256, 64, 2),
                                       (16, 32, 512, 128, 3),
                                       (16, 32, 256, 64, 5)])
@pytest.mark.parametrize("variant", ["block", "stage"])
def test_fused_stage_matches_xla_chain(rng, h, w, c, p, n, variant):
    from cald_tpu.ops.pallas_bottleneck import (maybe_fused_stage,
                                                maybe_fused_stage_deep)

    fuse_fn = maybe_fused_stage_deep if variant == "stage" else maybe_fused_stage
    x = jnp.asarray(rng.normal(0, 1, (2, h, w, c)).astype(np.float32))
    blocks = _blocks(rng, c, p, n)

    ref = x
    for blk in blocks:
        ref = _xla_block(ref, *blk)                      # f32 ground truth
    got = jax.jit(lambda x: fuse_fn(x.astype(jnp.bfloat16), blocks))(x)
    assert got is not None
    r, g = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    # bf16 kernel vs f32 chain: mean-relative error must stay in the bf16
    # class; borders included (checks the zero-ring 'SAME' semantics)
    scale = np.abs(r).mean() + 1e-6
    assert np.abs(r - g).mean() / scale < 0.03
    # borders specifically (halo ring correctness)
    edge = np.concatenate([np.abs(r[:, 0] - g[:, 0]).ravel(),
                           np.abs(r[:, -1] - g[:, -1]).ravel(),
                           np.abs(r[:, :, 0] - g[:, :, 0]).ravel(),
                           np.abs(r[:, :, -1] - g[:, :, -1]).ravel()])
    assert edge.mean() / scale < 0.03


@tpu_only
def test_border_zero_same_semantics_with_positive_bias(rng):
    """Regression for the halo-bias bug (ADVICE r2): with a large positive b1
    the biased 1x1 turns the zero ring into relu(b1); the kernel must mask
    those out-of-image halo positions back to zero before the 3x3 taps, or
    every border pixel inherits a spurious bias contribution. Tolerance here
    is bf16-roundoff-class — far below the bug's O(b1·|w2|) border error."""
    from cald_tpu.ops.pallas_bottleneck import maybe_fused_stage

    c, p = 256, 64
    mk = lambda *s: jnp.asarray(rng.normal(0, 0.08, s).astype(np.float32))
    blk = (mk(c, p), jnp.full((p,), 1.0), mk(3, 3, p, p), mk(p), mk(p, c),
           mk(c))
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 32, c)).astype(np.float32))
    ref = np.asarray(_xla_block(x, *blk), np.float32)
    got = jax.jit(lambda x: maybe_fused_stage(x.astype(jnp.bfloat16),
                                              [blk]))(x)
    assert got is not None
    g = np.asarray(got, np.float32)
    scale = np.abs(ref).mean() + 1e-6
    border = np.concatenate([(ref[:, 0] - g[:, 0]).ravel(),
                             (ref[:, -1] - g[:, -1]).ravel(),
                             (ref[:, :, 0] - g[:, :, 0]).ravel(),
                             (ref[:, :, -1] - g[:, :, -1]).ravel()])
    assert np.abs(border).mean() / scale < 0.02
    assert np.abs(border).max() / scale < 0.15


@tpu_only
def test_backbone_fused_gate_optin(rng, monkeypatch):
    """Default OFF; CALD_TPU_PALLAS_BNECK=1 engages and matches the XLA path
    within bf16 tolerance on the full backbone."""
    from cald_tpu.models.resnet import ResNetBackbone

    m = ResNetBackbone(blocks_per_stage=(2, 2, 2, 2), width=32, norm="frozen",
                       dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 128, 3)).astype(np.float32))
    v = jax.jit(m.init)(jax.random.key(0), x)
    fr = jax.tree.map(lambda a: jnp.asarray(
        rng.normal(1.0, 0.1, a.shape), a.dtype), v["frozen"])
    v = {**v, "frozen": fr}

    ref = jax.jit(lambda v, x: m.apply(v, x, allow_fused=True))(v, x)
    monkeypatch.setenv("CALD_TPU_PALLAS_BNECK", "1")
    fus = jax.jit(lambda v, x: m.apply(v, x, allow_fused=True))(v, x)
    for k in ref:
        r = np.asarray(ref[k], np.float32)
        g = np.asarray(fus[k], np.float32)
        assert np.abs(r - g).mean() / (np.abs(r).mean() + 1e-6) < 0.05, k
