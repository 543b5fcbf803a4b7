"""VLM text generation facade: messages+images -> completion strings.

Bridges the data front-end (templates, image preprocessing, M-RoPE) and the
RolloutEngine into the role vLLM's ``LLM.generate`` plays in the reference
eval drivers (vLLM_Qwen_detect_format.py:172-250) and chat engines
(llamafactory chat/vllm_engine.py).  All shapes are static: fixed prompt
length, fixed patch budget, fixed batch -- one compiled program serves the
whole benchmark run.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from iadr1_tpu.data.mm import expand_image_tokens
from iadr1_tpu.train.rollout import RolloutEngine, SamplingConfig
from iadr1_tpu.vision import preprocess as vp
from iadr1_tpu.vision.mrope import get_mrope_positions


@dataclasses.dataclass
class GeneratorConfig:
    max_prompt_length: int = 1024
    max_new_tokens: int = 512
    temperature: float = 0.0          # eval default (greedy)
    top_p: float = 0.8                # reference SamplingParams (:36-40)
    top_k: int = 0
    batch_size: int = 4
    patch_budget: int = 4096
    min_pixels: int = 56 * 56
    max_pixels: int = 480000
    seed: int = 0


class VLMGenerator:
    def __init__(self, bundle, params, tokenizer, template,
                 cfg: GeneratorConfig):
        self.bundle = bundle
        self.params = params
        self.tokenizer = tokenizer
        self.template = template
        self.cfg = cfg
        self._rng = jax.random.PRNGKey(cfg.seed)
        sampling = SamplingConfig(
            max_new_tokens=cfg.max_new_tokens,
            temperature=cfg.temperature, top_p=cfg.top_p, top_k=cfg.top_k,
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id or tokenizer.eos_token_id,
        )
        self.engine = RolloutEngine(
            bundle, sampling,
            max_len=cfg.max_prompt_length + cfg.max_new_tokens,
        )

    def update_params(self, params) -> None:
        """Hot-swap weights (e.g. newest GRPO policy); no copy, no transfer."""
        self.params = params

    # --- request encoding --------------------------------------------------

    def _encode_request(self, messages, images):
        """-> (prompt_ids, patches [n, d] or None, grids)."""
        patches, grids, seqlens = [], [], []
        for img in images or []:
            from PIL import Image

            pil = Image.open(img) if isinstance(img, str) else img
            flat, grid, seqlen = self.bundle.preprocess_image(
                pil, min_pixels=self.cfg.min_pixels,
                max_pixels=self.cfg.max_pixels,
            )
            patches.append(flat)
            grids.append(grid)
            seqlens.append(seqlen)
        if self.bundle.multimodal and seqlens:
            messages = expand_image_tokens(
                messages, seqlens, self.template.mm_style,
                self.template.image_token,
            )
        else:
            messages = [
                {**m, "content": m["content"].replace("<image>", "")}
                for m in messages
            ]
        ids = self.template.encode_prompt(self.tokenizer, messages)
        if seqlens and self.template.mm_style == "paligemma":
            from iadr1_tpu.data.mm import prepend_image_tokens

            ids, _ = prepend_image_tokens(
                ids, None, seqlens, self.bundle.cfg.image_token_id
            )
        ids = ids[-self.cfg.max_prompt_length :]
        return ids, patches, grids

    def _collate(self, encoded):
        P = self.cfg.max_prompt_length
        B = self.cfg.batch_size
        pad = self.tokenizer.pad_token_id or self.tokenizer.eos_token_id
        input_ids = np.full((B, P), pad, np.int64)
        mask = np.zeros((B, P), np.int64)
        patches_list, grids = [], []
        for i, (ids, patches, grid) in enumerate(encoded):
            input_ids[i, P - len(ids):] = ids
            mask[i, P - len(ids):] = 1
            patches_list.extend(patches)
            grids.extend(grid)
        batch = {
            "input_ids": jnp.asarray(input_ids, jnp.int32),
            "attention_mask": jnp.asarray(mask, jnp.int32),
        }
        tcfg = getattr(self.bundle.cfg, "text", self.bundle.cfg)
        if tcfg.mrope_section is not None:
            grid_thw = np.asarray(grids, np.int64).reshape(-1, 3)
            pos, deltas = get_mrope_positions(
                input_ids, grid_thw if len(grids) else None,
                self.bundle.cfg.image_token_id,
                self.bundle.cfg.vision_start_token_id,
                attention_mask=mask,
            )
            batch["position_ids"] = jnp.asarray(pos, jnp.int32)
            batch["mrope_deltas"] = jnp.asarray(deltas, jnp.int32)
        if self.bundle.multimodal:
            arrays = self.bundle.vision_arrays(
                input_ids, patches_list, grids, self.cfg.patch_budget
            )
            batch.update({k: jnp.asarray(v) for k, v in arrays.items()})
        return batch

    # --- public API ---------------------------------------------------------

    def generate(self, requests: list[dict]) -> list[str]:
        """requests: [{"messages": [...], "images": [paths/PIL]}] -> texts.

        Requests are processed in fixed-size compiled batches; short final
        batches are padded with dummy rows.
        """
        out: list[str] = []
        B = self.cfg.batch_size
        for i in range(0, len(requests), B):
            chunk = requests[i : i + B]
            encoded = [
                self._encode_request(r["messages"], r.get("images"))
                for r in chunk
            ]
            while len(encoded) < B:  # pad with a dummy row
                encoded.append((encoded[0][0][:4], [], []))
            batch = self._collate(encoded)
            self._rng, sub = jax.random.split(self._rng)
            result = self.engine.generate(self.params, batch, sub)
            ids = np.asarray(result["completion_ids"])
            mask = np.asarray(result["completion_mask"]).astype(bool)
            texts = self.tokenizer.batch_decode(
                [ids[b][mask[b]] for b in range(len(chunk))],
                skip_special_tokens=True,
            )
            out.extend(texts)
        return out
