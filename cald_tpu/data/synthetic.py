"""Synthetic mini-dataset generators (VOC and COCO layouts).

Used by the test suite, the benchmark harness, and smoke verification — there is
no real VOC/COCO data in the environment. The generated trees are byte-for-byte
valid for the real parsers in ``cald_tpu.data``.
"""

from __future__ import annotations

import json
import os

import numpy as np


def make_voc(root, num_images=6, size_range=((40, 80), (40, 80)), classes=None,
             max_objects=3, seed=0, year="2007", image_set="trainval",
             extra_image_sets=("test", "val")):
    """Write a tiny VOCdevkit tree with random JPEG images + XML annotations.

    The full id list is written to ``image_set`` and (for driver smoke runs
    that want a test split) to each name in ``extra_image_sets``.
    Returns the devkit root (containing VOC{year}/).
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    classes = classes or ["aeroplane", "bicycle", "bird", "person"]
    voc = os.path.join(str(root), f"VOC{year}")
    for sub in ("JPEGImages", "Annotations", os.path.join("ImageSets", "Main")):
        os.makedirs(os.path.join(voc, sub), exist_ok=True)

    ids = []
    for n in range(num_images):
        img_id = f"{n:06d}"
        ids.append(img_id)
        h = int(rng.integers(*size_range[0]))
        w = int(rng.integers(*size_range[1]))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(voc, "JPEGImages", img_id + ".jpg"))

        objs = []
        for _ in range(int(rng.integers(1, max_objects + 1))):
            x1 = int(rng.integers(1, w - 10))
            y1 = int(rng.integers(1, h - 10))
            x2 = int(rng.integers(x1 + 5, min(x1 + 30, w)))
            y2 = int(rng.integers(y1 + 5, min(y1 + 30, h)))
            cls = classes[int(rng.integers(len(classes)))]
            diff = int(rng.random() < 0.15)
            objs.append(
                f"<object><name>{cls}</name><difficult>{diff}</difficult>"
                f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin>"
                f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>")
        xml = (f"<annotation><filename>{img_id}.jpg</filename>"
               f"<size><width>{w}</width><height>{h}</height><depth>3</depth></size>"
               + "".join(objs) + "</annotation>")
        with open(os.path.join(voc, "Annotations", img_id + ".xml"), "w") as f:
            f.write(xml)

    for name in (image_set,) + tuple(extra_image_sets):
        with open(os.path.join(voc, "ImageSets", "Main", name + ".txt"), "w") as f:
            f.write("\n".join(ids) + "\n")
    return str(root)


def make_coco(root, num_images=5, hw=(50, 60), num_classes=3, seed=0,
              split="train", year="2017"):
    """Write a tiny COCO tree (images + instances json). Returns root."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(str(root), f"{split}{year}")
    ann_dir = os.path.join(str(root), "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    # sparse category ids on purpose (tests dense remapping)
    cat_ids = [3 * i + 1 for i in range(num_classes)]
    images, annotations = [], []
    ann_id = 1
    for n in range(num_images):
        h, w = hw
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        fname = f"img{n:04d}.jpg"
        Image.fromarray(img).save(os.path.join(img_dir, fname))
        images.append({"id": 100 + n, "file_name": fname, "width": w, "height": h})
        for _ in range(int(rng.integers(1, 4))):
            x = float(rng.uniform(0, w - 12))
            y = float(rng.uniform(0, h - 12))
            bw = float(rng.uniform(4, 12))
            bh = float(rng.uniform(4, 12))
            annotations.append({
                "id": ann_id, "image_id": 100 + n,
                "category_id": cat_ids[int(rng.integers(num_classes))],
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1
    data = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c, "name": f"cat{c}"} for c in cat_ids],
    }
    with open(os.path.join(ann_dir, f"instances_{split}{year}.json"), "w") as f:
        json.dump(data, f)
    return str(root)


def make_learnable_voc(root, num_images=32, hw=(96, 128), seed=0, year="2007",
                       class_probs=None):
    """A LEARNABLE synthetic VOC set: solid color-coded rectangles (class =
    color) on a gray background. A tiny detector reaches per-class AP50 > 0.9
    within ~30 short epochs — the end-to-end training-signal check.

    ``class_probs``: optional per-class sampling weights (default uniform) —
    imbalanced pools are the setup for selection-effectiveness experiments
    (CALD's class-balance stage should find the rare class faster than
    random; experiments/selection_effectiveness.py).
    """
    import os

    from PIL import Image

    rng = np.random.default_rng(seed)
    classes = ["aeroplane", "bicycle", "bird"]
    colors = [(220, 40, 40), (40, 220, 40), (40, 40, 220)]
    probs = (np.asarray(class_probs, float) / np.sum(class_probs)
             if class_probs is not None else None)
    voc = os.path.join(str(root), f"VOC{year}")
    for sub in ("JPEGImages", "Annotations", os.path.join("ImageSets", "Main")):
        os.makedirs(os.path.join(voc, sub), exist_ok=True)
    ids = []
    h, w = hw
    for i in range(num_images):
        img_id = f"{i:06d}"
        ids.append(img_id)
        img = np.full((h, w, 3), 128, np.uint8)
        img += rng.integers(-10, 10, img.shape).astype(np.uint8)
        objs = []
        for _ in range(int(rng.integers(1, 3))):
            c = int(rng.choice(len(classes), p=probs))
            bw, bh = int(rng.integers(24, 48)), int(rng.integers(24, 48))
            x1 = int(rng.integers(1, w - bw))
            y1 = int(rng.integers(1, h - bh))
            img[y1:y1 + bh, x1:x1 + bw] = colors[c]
            objs.append((classes[c], x1, y1, x1 + bw, y1 + bh))
        Image.fromarray(img).save(os.path.join(voc, "JPEGImages", img_id + ".jpg"))
        xml_objs = "".join(
            f"<object><name>{n_}</name><difficult>0</difficult><bndbox>"
            f"<xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax>"
            f"</bndbox></object>" for n_, x1, y1, x2, y2 in objs)
        with open(os.path.join(voc, "Annotations", img_id + ".xml"), "w") as f:
            f.write(f"<annotation><filename>{img_id}.jpg</filename><size>"
                    f"<width>{w}</width><height>{h}</height><depth>3</depth>"
                    f"</size>{xml_objs}</annotation>")
    for split in ("trainval", "test"):
        with open(os.path.join(voc, "ImageSets", "Main", split + ".txt"), "w") as f:
            f.write("\n".join(ids))
    return str(root)
