"""Native data-loader core tests (skipped when the .so isn't built —
``make -C native``)."""

import numpy as np
import pytest

from cald_tpu import native
from cald_tpu.data import BatchLoader, Canvas, get_voc2007
from cald_tpu.data.loader import decode_image
from tests.fixtures import make_voc

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libcald_data.so not built")


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    return make_voc(tmp_path_factory.mktemp("voc_native"), num_images=4,
                    size_range=((50, 90), (50, 90)))


def test_decode_matches_pil(voc_root):
    from PIL import Image

    ds = get_voc2007(voc_root, "trainval")
    path = ds.record(0).image_path
    with Image.open(path) as im:
        ref = np.asarray(im.convert("RGB"), np.uint8)
    got = native.decode(path)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_image_size_header_probe(voc_root):
    ds = get_voc2007(voc_root, "trainval")
    rec = ds.record(1)
    w, h = native.image_size(rec.image_path)
    assert (w, h) == (rec.width, rec.height)


def test_decode_resize_close_to_pil_resize(voc_root):
    from cald_tpu.data.batching import resize_image

    ds = get_voc2007(voc_root, "trainval")
    rec = ds.record(2)
    img = decode_image(rec.image_path)
    scale = 1.3
    rh, rw = int(round(rec.height * scale)), int(round(rec.width * scale))
    ref = resize_image(img, rh, rw)
    canvas = np.zeros((rh + 8, rw + 8, 3), np.float32)
    gh, gw = native.decode_resize_into(rec.image_path, canvas, scale)
    assert (gh, gw) == (rh, rw)
    # PIL uses a slightly different filter support; values agree closely
    diff = np.abs(canvas[:rh, :rw] - ref)
    assert float(diff.mean()) < 2.0
    assert canvas[rh:, :].sum() == 0


def test_loader_fast_path_matches_pil_path(voc_root):
    ds = get_voc2007(voc_root, "trainval")
    kw = dict(canvases=(Canvas(128, 128),), min_size=96, max_size=128,
              max_boxes=8, num_workers=1)
    batches = [[0, 1]]
    fast = next(iter(BatchLoader(ds, batches, **kw)))
    # force the PIL path by pretending the lib is unavailable
    import cald_tpu.native as nat
    orig = nat.available
    nat.available = lambda: False
    try:
        slow = next(iter(BatchLoader(ds, batches, **kw)))
    finally:
        nat.available = orig
    np.testing.assert_array_equal(fast.valid_hw, slow.valid_hw)
    np.testing.assert_allclose(fast.scale, slow.scale, rtol=1e-6)
    np.testing.assert_allclose(fast.boxes, slow.boxes, rtol=1e-5)
    assert float(np.abs(fast.images - slow.images).mean()) < 2.0
