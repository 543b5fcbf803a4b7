"""Batch assembly: packed rows + host vision precompute -> jit-ready arrays.

The TPU counterpart of MultiModalDataCollatorForSeq2Seq
(llamafactory/data/collator.py:78-160): instead of ragged pixel batches +
4-D masks + per-batch M-RoPE computation in torch, every batch is a set of
static-shape arrays -- packed token rows with segment ids, a padded patch
stream with per-image segments, scatter indices, and precomputed [3, B, T]
M-RoPE grids.  The reference's ZeRO-3 fake-image trick (collator.py:104-125)
is unnecessary: SPMD programs have no per-rank divergence.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from iadr1_tpu.data.tokenize import IGNORE_INDEX
from iadr1_tpu.vision import preprocess as vp


@dataclasses.dataclass
class VLMBatchBuilder:
    """Builds VLM batches from packed rows whose extras carry image info.

    extras per segment: {"images": [paths or PIL], "grid_thw": [(t,h,w)],
    "patches": np [n, patch_dim] (optional, if preprocessed already)}.
    Family-specific vision arrays (rotary tables, window permutations,
    scatter indices) come from ``bundle.vision_arrays``.
    """

    bundle: object                 # ModelBundle
    patch_budget: int              # static max patches per batch
    merge_size: int = 2
    min_pixels: int = 56 * 56
    max_pixels: int = 480000       # reference RL default (SC_GRPO scripts)

    @property
    def image_token_id(self) -> int:
        return self.bundle.cfg.image_token_id

    @property
    def vision_start_token_id(self) -> int:
        return self.bundle.cfg.vision_start_token_id

    @property
    def spatial_merge_size(self) -> int:
        return self.bundle.cfg.vision.spatial_merge_size

    def __call__(self, rows: Sequence[dict]) -> dict:
        B = len(rows)
        T = len(rows[0]["input_ids"])
        input_ids = np.stack([r["input_ids"] for r in rows])
        labels = np.stack([r["labels"] for r in rows])
        segment_ids = np.stack([r["segment_ids"] for r in rows])

        patches_list, grids, videos_list = [], [], []
        for r in rows:
            for extra in r.get("extras", []):
                if "patches" in extra:
                    for p, g in zip(extra["patches"], extra["grid_thw"]):
                        patches_list.append(p)
                        grids.append(g)
                else:
                    for img in extra.get("images", []):
                        from PIL import Image

                        pil = Image.open(img) if isinstance(img, str) else img
                        flat, grid, _ = self.bundle.preprocess_image(
                            pil, min_pixels=self.min_pixels,
                            max_pixels=self.max_pixels,
                        )
                        patches_list.append(flat)
                        grids.append(grid)
                if "video_patches" in extra:
                    videos_list.extend(extra["video_patches"])
                elif extra.get("videos"):
                    if self.bundle.preprocess_video is None:
                        raise ValueError(
                            f"family {self.bundle.family} has no video "
                            "preprocessing path")
                    for frames in extra["videos"]:
                        vp_, _meta, _n = self.bundle.preprocess_video(frames)
                        videos_list.append(vp_)

        # positions per packed segment: M-RoPE grids for qwen-vl families,
        # the rows' plain restarting positions otherwise.  Grid tuples are
        # family-specific (qwen: (t,h,w); llava anyres: (n_h,n_w,oh,ow)) so
        # the (t,h,w) reshape happens only on the M-RoPE path --
        # vision_arrays receives the raw per-family grids.
        tcfg = getattr(self.bundle.cfg, "text", self.bundle.cfg)
        if tcfg.mrope_section is not None:
            from iadr1_tpu.vision.mrope import get_mrope_positions

            grid_thw = np.asarray(grids, np.int64).reshape(-1, 3)

            position_ids = np.zeros((3, B, T), np.int64)
            gi = 0
            for b, r in enumerate(rows):
                segs = r["segment_ids"]
                for s in np.unique(segs[segs != 0]):
                    span = segs == s
                    ids_span = input_ids[b][span][None]
                    # count images in this segment by vision_start markers
                    n_starts = int(np.sum(ids_span == self.vision_start_token_id))
                    seg_grids = grid_thw[gi : gi + n_starts]
                    gi += n_starts
                    pos, _ = get_mrope_positions(
                        ids_span, seg_grids if n_starts else None,
                        self.image_token_id, self.vision_start_token_id,
                        spatial_merge_size=self.spatial_merge_size,
                    )
                    position_ids[:, b, span] = pos[:, 0]
        else:
            position_ids = np.stack([r["position_ids"] for r in rows])

        batch = {
            "input_ids": input_ids.astype(np.int32),
            "labels": labels.astype(np.int32),
            "segment_ids": segment_ids.astype(np.int32),
            "position_ids": position_ids.astype(np.int32),
        }
        va_kw = {"videos": videos_list} if videos_list else {}
        batch.update(
            self.bundle.vision_arrays(
                input_ids, patches_list, grids, self.patch_budget, **va_kw
            )
        )
        return batch


def text_batch(rows: Sequence[dict]) -> dict:
    """Plain-text batch from packed rows (1-D RoPE positions)."""
    return {
        "input_ids": np.stack([r["input_ids"] for r in rows]).astype(np.int32),
        "labels": np.stack([r["labels"] for r in rows]).astype(np.int32),
        "segment_ids": np.stack([r["segment_ids"] for r in rows]).astype(np.int32),
        "position_ids": np.stack([r["position_ids"] for r in rows]).astype(np.int32),
    }
