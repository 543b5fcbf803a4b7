"""AnyRes tiling and feature packing for the LLaVA-NeXT/OneVision families.

Host-side numpy equivalents of:
* HF LlavaOnevisionImageProcessor.get_image_patches (best-resolution
  selection, aspect-preserving resize, centered pad, tile division, plus the
  squashed base image) -- the reference invokes this via its mm_plugin
  (mm_plugin.py LlavaNextPlugin:327-379),
* HF LlavaOnevisionModel.pack_image_features / unpad_image (anyres spatial
  arrangement, anyres_max_N bilinear downscale, per-row newline embedding).

TPU design: the *plan* of the packing -- a [F, 4] gather-index + weight
table over tile features plus a newline mask -- is computed on host per
image; the device applies it as one weighted gather, so anyres stays inside
the jit program and stays differentiable into the tower.
"""

from __future__ import annotations

import math

import numpy as np

# HF LlavaOnevisionImageProcessor defaults (OpenAI-CLIP statistics); actual
# checkpoints may override via preprocessor_config.json.
DEFAULT_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
DEFAULT_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def select_best_resolution(original_size, possible_resolutions):
    """(h, w) maximizing effective resolution, minimizing waste."""
    oh, ow = original_size
    best, best_eff, best_waste = None, 0, float("inf")
    for h, w in possible_resolutions:
        scale = min(w / ow, h / oh)
        eff = min(int(ow * scale) * int(oh * scale), ow * oh)
        waste = w * h - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (h, w), eff, waste
    return best


def _patch_output_size(oh, ow, target):
    th, tw = target
    scale_w, scale_h = tw / ow, th / oh
    if scale_w < scale_h:
        nw, nh = tw, min(math.ceil(oh * scale_w), th)
    else:
        nh, nw = th, min(math.ceil(ow * scale_h), tw)
    return nh, nw


def onevision_tiles(image, grid_pinpoints, tile_size: int = 384,
                    mean=DEFAULT_MEAN, std=DEFAULT_STD):
    """PIL image -> (tiles [n, C, ts, ts] normalized f32, grid (n_h, n_w)).

    tiles[0] is the squashed base image; tiles[1:] are the anyres division
    of the best-resolution resize+pad, row-major.
    """
    from PIL import Image

    if image.mode != "RGB":
        image = image.convert("RGB")
    oh, ow = image.height, image.width
    best = select_best_resolution((oh, ow), grid_pinpoints)
    nh, nw = _patch_output_size(oh, ow, best)
    resized = image.resize((nw, nh), resample=Image.Resampling.BICUBIC)

    canvas = np.zeros((best[0], best[1], 3), np.float32)
    top, left = (best[0] - nh) // 2, (best[1] - nw) // 2
    canvas[top : top + nh, left : left + nw] = (
        np.asarray(resized, np.float32) / 255.0
    )

    n_h, n_w = best[0] // tile_size, best[1] // tile_size
    tiles = [
        np.asarray(
            image.resize((tile_size, tile_size), resample=Image.Resampling.BICUBIC),
            np.float32,
        )
        / 255.0
    ]
    for i in range(n_h):
        for j in range(n_w):
            tiles.append(
                canvas[i * tile_size : (i + 1) * tile_size,
                       j * tile_size : (j + 1) * tile_size]
            )
    arr = np.stack(tiles)                                   # [n, ts, ts, 3]
    arr = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return arr.transpose(0, 3, 1, 2), (n_h, n_w)


def patchify_tiles(tiles: np.ndarray, patch_size: int) -> np.ndarray:
    """[n, C, H, W] -> [n, (H//ps)*(W//ps), C*ps*ps] in conv-kernel order.

    Trailing rows/cols that do not fill a whole patch are dropped, exactly
    like the strided valid-padding patch-embed conv (SigLIP-so400m-384 has
    384 = 27*14 + 6: the final 6 pixels never enter the conv)."""
    n, c, h, w = tiles.shape
    gh, gw = h // patch_size, w // patch_size
    x = tiles[:, :, : gh * patch_size, : gw * patch_size]
    x = x.reshape(n, c, gh, patch_size, gw, patch_size)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(n, gh * gw, c * patch_size * patch_size).astype(np.float32)


def _unpad_bounds(cur_h, cur_w, original_size):
    """Row/col slice bounds of unpad_image (HF modeling:221-258)."""
    oh, ow = original_size
    if ow / oh > cur_w / cur_h:
        scale = cur_w / ow
        new_h = int(round(oh * scale, 7))
        pad = (cur_h - new_h) // 2
        return pad, cur_h - pad, 0, cur_w
    scale = cur_h / oh
    new_w = int(round(ow * scale, 7))
    pad = (cur_w - new_w) // 2
    return 0, cur_h, pad, cur_w - pad


def _bilinear_plan_1d(out_size, in_size, offset):
    """torch bilinear (align_corners=False) sampling plan along one axis."""
    coords = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    coords = np.clip(coords, 0, in_size - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = coords - lo
    return lo + offset, hi + offset, 1.0 - w_hi, w_hi


def onevision_pack_plan(
    original_size: tuple[int, int],
    grid: tuple[int, int],
    grid_side: int,
    max_tiles: int | None = 9,
) -> dict:
    """Gather plan for anyres feature packing.

    Tile features are assumed flattened as [n_tiles * grid_side^2] with
    tile 0 = base image.  Returns src [F, 4] indices, weights [F, 4], and
    newline_mask [F]; newline rows gather nothing (weights 0).

    F = grid_side^2 (base) + out_h * (out_w + 1) (spatial rows + newlines).
    """
    n_h, n_w = grid
    g = grid_side
    H, W = n_h * g, n_w * g

    def flat_idx(y, x):
        tile = (y // g) * n_w + (x // g) + 1     # +1: base tile is index 0
        return tile * g * g + (y % g) * g + (x % g)

    y0, y1, x0, x1 = _unpad_bounds(H, W, original_size)
    uh, uw = y1 - y0, x1 - x0

    # max_tiles=None: LLaVA-NeXT semantics (no anyres_max downscale)
    ratio = (
        math.sqrt(uh * uw / (max_tiles * g * g)) if max_tiles else 0.0
    )
    if ratio > 1.1:
        oh, ow = int(uh // ratio), int(uw // ratio)
        ylo, yhi, wy0, wy1 = _bilinear_plan_1d(oh, uh, y0)
        xlo, xhi, wx0, wx1 = _bilinear_plan_1d(ow, uw, x0)
    else:
        oh, ow = uh, uw
        ylo = yhi = np.arange(uh) + y0
        xlo = xhi = np.arange(uw) + x0
        wy0 = wx0 = np.ones(max(oh, 0))
        wy1 = wx1 = np.zeros(max(ow, 0))
        wy0, wy1 = np.ones(oh), np.zeros(oh)
        wx0, wx1 = np.ones(ow), np.zeros(ow)

    base_src = np.arange(g * g)                               # tile 0
    F = g * g + oh * (ow + 1)
    src = np.zeros((F, 4), np.int64)
    wts = np.zeros((F, 4), np.float32)
    newline = np.zeros(F, bool)

    src[: g * g, 0] = base_src
    wts[: g * g, 0] = 1.0

    pos = g * g
    for yy in range(oh):
        ys = (ylo[yy], yhi[yy])
        wy = (wy0[yy], wy1[yy])
        for xx in range(ow):
            xs = (xlo[xx], xhi[xx])
            wx = (wx0[xx], wx1[xx])
            k = 0
            for iy in range(2):
                for ix in range(2):
                    src[pos, k] = flat_idx(int(ys[iy]), int(xs[ix]))
                    wts[pos, k] = wy[iy] * wx[ix]
                    k += 1
            pos += 1
        newline[pos] = True
        pos += 1
    return {"src": src, "weights": wts, "newline": newline, "length": F,
            "out_hw": (oh, ow)}


def onevision_feature_len(original_size, grid, grid_side, max_tiles=9) -> int:
    """Packed feature count without building the full plan."""
    n_h, n_w = grid
    H, W = n_h * grid_side, n_w * grid_side
    y0, y1, x0, x1 = _unpad_bounds(H, W, original_size)
    uh, uw = y1 - y0, x1 - x0
    ratio = (
        math.sqrt(uh * uw / (max_tiles * grid_side ** 2)) if max_tiles else 0.0
    )
    if ratio > 1.1:
        oh, ow = int(uh // ratio), int(uw // ratio)
    else:
        oh, ow = uh, uw
    return grid_side ** 2 + oh * (ow + 1)


def pack_features_numpy(features: np.ndarray, plan: dict,
                        newline: np.ndarray) -> np.ndarray:
    """Reference execution of the plan (tests / host fallback).

    features: [n_tiles * g^2, D] flattened tile features; newline: [D].
    """
    gathered = (features[plan["src"]] * plan["weights"][..., None]).sum(axis=1)
    out = np.where(plan["newline"][:, None], newline[None, :], gathered)
    return out


def clip_resize_center_crop(image, size: int = 336,
                            mean=DEFAULT_MEAN, std=DEFAULT_STD):
    """CLIPImageProcessor path: shortest-edge bicubic resize + center crop +
    normalize -> [C, size, size] f32 (LLaVA-1.5 single-image input and the
    LLaVA-NeXT base tile)."""
    from PIL import Image

    if image.mode != "RGB":
        image = image.convert("RGB")
    w, h = image.width, image.height
    # HF get_resize_output_image_size truncates the long side (int(), not
    # round) -- off-by-one here shifts the crop window and every feature
    if w < h:
        nw, nh = size, int(h * size / w)
    else:
        nh, nw = size, int(w * size / h)
    image = image.resize((nw, nh), resample=Image.Resampling.BICUBIC)
    left = (nw - size) // 2
    top = (nh - size) // 2
    image = image.crop((left, top, left + size, top + size))
    arr = np.asarray(image, np.float32) / 255.0
    arr = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return arr.transpose(2, 0, 1)


def llava_next_tiles(image, grid_pinpoints, tile_size: int = 336,
                     mean=DEFAULT_MEAN, std=DEFAULT_STD):
    """LLaVA-NeXT anyres tiles.

    Identical to OneVision tiling: the base tile is the square-squashed
    original (HF get_image_patches resizes to the exact (size, size) tuple;
    center-cropping applies only to the single-image LLaVA-1.5 path).
    """
    return onevision_tiles(image, grid_pinpoints, tile_size, mean, std)
