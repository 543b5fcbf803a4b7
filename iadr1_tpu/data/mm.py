"""Multimodal message handling: image-placeholder expansion.

Behavior-compatible with the reference mm_plugin token expansion
(mm_plugin.py Qwen2vlPlugin.process_messages:850-897: each ``<image>``
placeholder becomes ``<|vision_start|>`` + image_token x (prod(grid)/merge^2)
+ ``<|vision_end|>``; LLaVA-style plugins substitute N copies of the plain
image token, mm_plugin.py:287-379).
"""

from __future__ import annotations

from typing import Sequence

IMAGE_PLACEHOLDER = "<image>"
VIDEO_PLACEHOLDER = "<video>"


def prepend_image_tokens(
    input_ids: Sequence[int],
    labels: Sequence[int] | None,
    image_seqlens: Sequence[int],
    image_token_id: int,
) -> tuple[list[int], list[int] | None]:
    """PaliGemma-style token-level image prefix: placeholders were
    stripped from the text (mm_style "paligemma") and the image-token run
    goes BEFORE the encoded ids -- ahead of BOS, exactly the HF processor
    / reference plugin order (mm_plugin.py:700-712 process_token_ids).
    Label positions for the run are IGNORE_INDEX."""
    from iadr1_tpu.data.tokenize import IGNORE_INDEX

    n = sum(image_seqlens)
    ids = [image_token_id] * n + list(input_ids)
    if labels is None:
        return ids, None
    return ids, [IGNORE_INDEX] * n + list(labels)


def expand_video_tokens(
    messages: Sequence[dict],
    video_seqlens: Sequence[int],
    mm_style: str,
    video_token: str = "<|video_pad|>",
) -> list[dict]:
    """Replace each VIDEO_PLACEHOLDER with the family's expanded token run
    (qwen2-vl: <|vision_start|> + video_token x N + <|vision_end|>,
    mm_plugin.py Qwen2vlPlugin.process_messages video branch)."""
    out = []
    idx = 0
    for message in messages:
        content = message["content"]
        while VIDEO_PLACEHOLDER in content:
            if idx >= len(video_seqlens):
                raise ValueError("more video placeholders than videos")
            n = video_seqlens[idx]
            if mm_style == "qwen2_vl":
                repl = f"<|vision_start|>{video_token * n}<|vision_end|>"
            else:
                repl = video_token * n
            content = content.replace(VIDEO_PLACEHOLDER, repl, 1)
            idx += 1
        out.append({**message, "content": content})
    if idx != len(video_seqlens):
        raise ValueError(
            f"{len(video_seqlens)} videos provided but {idx} placeholders found"
        )
    return out


def qwen2vl_image_seqlen(grid_thw, merge_size: int = 2) -> int:
    t, h, w = grid_thw
    return int(t * h * w) // (merge_size ** 2)


def expand_image_tokens(
    messages: Sequence[dict],
    image_seqlens: Sequence[int],
    mm_style: str,
    image_token: str,
) -> list[dict]:
    """Replace each IMAGE_PLACEHOLDER with the family's expanded token run.

    ``image_seqlens[i]`` is the number of feature tokens for the i-th image
    in reading order across the conversation.
    """
    out = []
    idx = 0
    for message in messages:
        content = message["content"]
        while IMAGE_PLACEHOLDER in content:
            if idx >= len(image_seqlens):
                raise ValueError(
                    "more image placeholders than provided images"
                )
            n = image_seqlens[idx]
            if mm_style == "qwen2_vl":
                repl = f"<|vision_start|>{image_token * n}<|vision_end|>"
            elif mm_style in ("llava", "plain"):
                repl = image_token * n
            elif mm_style == "intern_vl":
                repl = f"<img>{image_token * n}</img>"
            elif mm_style == "paligemma":
                # placeholders are STRIPPED from the text; the image-token
                # run is prepended at the token level after encoding
                # (prepend_image_tokens; reference mm_plugin.py:693-712)
                repl = ""
            elif mm_style == "pixtral":
                # rows of [IMG] x cols ending [IMG_BREAK], last row ends
                # [IMG_END] (reference mm_plugin.py:760-781); the seqlen
                # entry is the (rows, cols) patch grid
                gh, gw = n
                body = (image_token * gw + "[IMG_BREAK]") * gh
                repl = body[: -len("[IMG_BREAK]")] + "[IMG_END]"
            else:
                raise ValueError(f"unknown mm style {mm_style!r}")
            content = content.replace(IMAGE_PLACEHOLDER, repl, 1)
            idx += 1
        out.append({**message, "content": content})
    if idx != len(image_seqlens):
        raise ValueError(
            f"{len(image_seqlens)} images provided but {idx} placeholders found"
        )
    return out
