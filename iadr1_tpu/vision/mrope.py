"""M-RoPE position grids for Qwen2-VL-family models (host-side numpy).

For every image span, temporal/height/width positions form a 3-D grid offset
by the running text position; text spans advance all three axes together,
restarting at max(previous)+1.  Semantics match HF
Qwen2VLModel.get_rope_index, which the reference invokes from its collator
(llamafactory/data/collator.py:137-143) to build position_ids/rope_deltas.

Computed on host per batch (data-dependent, trivial cost) and fed to the jit
program as a [3, B, T] array -- the TPU-friendly split of the reference's
on-the-fly computation.
"""

from __future__ import annotations

import numpy as np


def get_mrope_positions(
    input_ids: np.ndarray,
    grid_thw: np.ndarray | None,
    image_token_id: int,
    vision_start_token_id: int,
    attention_mask: np.ndarray | None = None,
    spatial_merge_size: int = 2,
    video_token_id: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(position_ids [3, B, T], deltas [B]) for image+text sequences.

    ``grid_thw`` rows are consumed in reading order across the batch.  Rows
    with no vision tokens get plain 0..n positions over their unpadded span.
    Padding positions (attention_mask == 0) get position 1 (HF behavior).
    """
    input_ids = np.asarray(input_ids)
    B, T = input_ids.shape
    if attention_mask is None:
        attention_mask = np.ones_like(input_ids)
    position_ids = np.ones((3, B, T), np.int64)
    deltas = np.zeros(B, np.int64)
    grid_idx = 0

    for b in range(B):
        keep = attention_mask[b] == 1
        ids = input_ids[b][keep]
        spans: list[np.ndarray] = []
        st = 0
        tokens = ids.tolist()
        n_vision = int(np.sum(ids == vision_start_token_id)) if grid_thw is not None else 0

        for _ in range(n_vision):
            # a vision span starts at the first image OR video pad token
            # (videos share the image scatter/position machinery; HF
            # get_rope_index uses the same (t,h,w) grid walk for both)
            cands = []
            for tid in (image_token_id, video_token_id):
                if tid is None:
                    continue
                try:
                    cands.append(tokens.index(tid, st))
                except ValueError:
                    pass
            if not cands:
                break
            ed = min(cands)
            t, h, w = grid_thw[grid_idx]
            grid_idx += 1
            gt, gh, gw = int(t), int(h) // spatial_merge_size, int(w) // spatial_merge_size
            text_len = ed - st
            start = spans[-1].max() + 1 if spans else 0
            if text_len > 0:
                spans.append(
                    np.broadcast_to(np.arange(text_len), (3, text_len)) + start
                )
                start = start + text_len
            t_idx = np.repeat(np.arange(gt), gh * gw)
            h_idx = np.tile(np.repeat(np.arange(gh), gw), gt)
            w_idx = np.tile(np.arange(gw), gt * gh)
            spans.append(np.stack([t_idx, h_idx, w_idx]) + start)
            st = ed + gt * gh * gw

        if st < len(tokens):
            start = spans[-1].max() + 1 if spans else 0
            text_len = len(tokens) - st
            spans.append(
                np.broadcast_to(np.arange(text_len), (3, text_len)) + start
            )

        if spans:
            pos = np.concatenate(spans, axis=1)
        else:
            pos = np.zeros((3, 0), np.int64)
        position_ids[:, b, keep] = pos
        deltas[b] = (pos.max() + 1 if pos.size else 0) - T
    return position_ids, deltas
