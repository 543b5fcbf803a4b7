"""Vision front-end: pure-function image preprocessing and position grids.

Replaces the reference's mm_plugin + HF image-processor stack
(llamafactory/data/mm_plugin.py) with numpy host-side preprocessing that
produces static-shape patch streams + index arrays for the TPU towers.
"""

from iadr1_tpu.vision.preprocess import (
    smart_resize,
    area_cap_resize,
    qwen_clamp_image,
    qwen2vl_preprocess,
)
from iadr1_tpu.vision.mrope import get_mrope_positions
