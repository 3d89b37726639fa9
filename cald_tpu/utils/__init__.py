"""Misc host utilities (visualization, label maps)."""

from cald_tpu.utils.viz import draw_detections, save_detection_image

__all__ = ["draw_detections", "save_detection_image"]
