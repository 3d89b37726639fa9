"""Data layer tests: parsing, grouping, padded batching, AL pool, loader."""

import numpy as np
import pytest

from cald_tpu.data import (
    ALPoolState, BatchLoader, Canvas, VOC_CLASSES, choose_canvas,
    create_aspect_ratio_groups, default_canvases, get_coco, get_voc2007,
    grouped_batch_indices, make_padded_batch, resize_scale,
)
from cald_tpu.data.transforms import random_horizontal_flip
from tests.fixtures import make_coco, make_voc


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    return make_voc(tmp_path_factory.mktemp("voc"), num_images=8)


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    return make_coco(tmp_path_factory.mktemp("coco"), num_images=6)


class TestVOC:
    def test_parse(self, voc_root):
        ds = get_voc2007(voc_root, "trainval")
        assert len(ds) == 8
        rec = ds.record(0)
        assert rec.boxes.shape[1] == 4
        assert rec.boxes.dtype == np.float32
        # boxes are 0-based (xml coord - 1) and inside the image
        assert (rec.boxes[:, 0] >= 0).all()
        assert (rec.boxes[:, 2] <= rec.width).all()
        assert (rec.labels >= 1).all() and (rec.labels < len(VOC_CLASSES)).all()

    def test_aspect_ratios(self, voc_root):
        ds = get_voc2007(voc_root, "trainval")
        ars = ds.aspect_ratios()
        assert ars.shape == (8,)
        assert (ars > 0).all()


class TestCOCO:
    def test_parse_and_dense_remap(self, coco_root):
        ds = get_coco(coco_root, "train")
        assert len(ds) == 6
        assert ds.num_classes == 4  # 3 sparse categories + background
        rec = ds.record(0)
        # xywh -> xyxy conversion keeps x2 > x1
        assert (rec.boxes[:, 2] > rec.boxes[:, 0]).all()
        assert set(np.unique(rec.labels)) <= {1, 2, 3}
        # dense label -> native category id round trip
        idx = ds.index
        for lbl in np.unique(rec.labels):
            assert idx.cat_to_label[idx.label_to_cat[int(lbl)]] == int(lbl)


class TestBatching:
    def test_resize_scale_rule(self):
        # torchvision rule: min(min/min_side, max/max_side)
        assert resize_scale(375, 500, 600, 1000) == pytest.approx(1.6)
        assert resize_scale(100, 1000, 600, 1000) == pytest.approx(1.0)

    def test_default_canvases(self):
        cvs = default_canvases(600, 1000)
        assert len(cvs) == 2
        for c in cvs:
            assert c.height % 64 == 0 and c.width % 64 == 0

    def test_choose_canvas(self):
        cvs = (Canvas(640, 1024), Canvas(1024, 640))
        assert choose_canvas(600, 1000, cvs) == Canvas(640, 1024)
        assert choose_canvas(1000, 600, cvs) == Canvas(1024, 640)

    def test_grouping_matches_reference_binning(self):
        ars = np.array([0.4, 0.9, 1.0, 1.1, 2.5])
        gids = create_aspect_ratio_groups(ars, k=1)
        # bins at [0.5, 1.0, 2.0] with bisect_right (reference _quantize,
        # group_by_aspect_ratio.py:179-183): 0.4->0, 0.9->1, 1.0->2, 1.1->2, 2.5->3
        assert gids.tolist() == [0, 1, 2, 2, 3]

    def test_grouped_batches_same_group_and_padding(self):
        gids = np.array([0, 0, 0, 1, 1])
        batches = grouped_batch_indices(range(5), gids, batch_size=2)
        for b in batches:
            assert len(b) == 2
            assert len({int(gids[i]) for i in b}) == 1
        flat = [i for b in batches for i in b]
        assert set(flat) == {0, 1, 2, 3, 4}  # everything appears

    def test_padded_batch_shapes_and_scaling(self, voc_root):
        ds = get_voc2007(voc_root, "trainval")
        recs = [ds.record(i) for i in range(2)]
        from cald_tpu.data.loader import decode_image
        imgs = [decode_image(r.image_path) for r in recs]
        canvas = Canvas(128, 128)
        batch = make_padded_batch(imgs, recs, canvas, min_size=100, max_size=120,
                                  max_boxes=8, indices=[0, 1])
        assert batch.images.shape == (2, 128, 128, 3)
        assert batch.boxes.shape == (2, 8, 4)
        # boxes scaled by the same factor as the image
        for i, rec in enumerate(recs):
            n = min(len(rec.boxes), 8)
            np.testing.assert_allclose(batch.boxes[i, :n], rec.boxes[:n] * batch.scale[i],
                                       rtol=1e-6)
            assert batch.box_valid[i, :n].all()
            assert not batch.box_valid[i, n:].any()
        # padding region is zeros
        rh, rw = batch.valid_hw[0]
        assert batch.images[0, rh:, :, :].sum() == 0
        assert batch.images[0, :, rw:, :].sum() == 0


class TestTransforms:
    def test_flip_boxes(self):
        img = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
        boxes = np.array([[0.0, 0.0, 1.0, 2.0]], np.float32)
        rng = np.random.default_rng(0)
        fimg, fboxes = random_horizontal_flip(img, boxes, rng, p=1.0)
        np.testing.assert_array_equal(fimg, img[:, ::-1])
        np.testing.assert_allclose(fboxes, [[3.0, 0.0, 4.0, 2.0]])


class TestALPool:
    def test_initial_split_disjoint(self):
        st = ALPoolState.initial(100, 30, seed=1)
        assert len(st.labeled) == 30 and len(st.unlabeled) == 70
        assert len(np.intersect1d(st.labeled, st.unlabeled)) == 0

    def test_select_moves_indices(self):
        st = ALPoolState.initial(50, 10, seed=0)
        chosen = st.unlabeled[:5]
        st2 = st.select(chosen)
        assert st2.cycle == 1
        assert len(st2.labeled) == 15
        assert np.isin(chosen, st2.labeled).all()
        assert not np.isin(chosen, st2.unlabeled).any()
        with pytest.raises(ValueError):
            st2.select(chosen)  # already labeled

    def test_roundtrip_dict(self):
        st = ALPoolState.initial(20, 5, seed=3)
        st2 = ALPoolState.from_dict(st.to_dict())
        np.testing.assert_array_equal(st.labeled, st2.labeled)
        assert st2.cycle == st.cycle

    def test_subsample_pool(self):
        st = ALPoolState.initial(100, 10)
        sub = st.subsample_pool(30, np.random.default_rng(0))
        assert len(sub) == 30
        assert np.isin(sub, st.unlabeled).all()


class TestLoader:
    def test_loader_yields_all_batches_deterministically(self, voc_root):
        ds = get_voc2007(voc_root, "trainval")
        gids = create_aspect_ratio_groups(ds.aspect_ratios(), k=1)
        batches = grouped_batch_indices(range(len(ds)), gids, batch_size=2,
                                        rng=np.random.default_rng(0))
        loader = BatchLoader(ds, batches, canvases=(Canvas(128, 128),),
                             min_size=96, max_size=128, max_boxes=8,
                             transform=lambda im, bx, r: random_horizontal_flip(im, bx, r),
                             num_workers=2, seed=7)
        got1 = [b.image_idx.tolist() for b in loader]
        got2 = [b.image_idx.tolist() for b in loader]
        assert got1 == got2 == [b for b in batches]
        for b in loader:
            assert b.images.shape == (2, 128, 128, 3)
