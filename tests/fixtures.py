"""Synthetic mini-dataset builders shared by data/engine/strategy tests.

Thin re-export: the real generators live in ``cald_tpu.data.synthetic`` so that
bench.py and smoke-verification scripts can use them too.
"""

from cald_tpu.data.synthetic import make_coco, make_voc

__all__ = ["make_coco", "make_voc"]
