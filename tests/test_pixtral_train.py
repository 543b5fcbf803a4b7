"""Pixtral SFT trainability: the structured row expansion (mm_style
"pixtral") feeds the packed-patch-stream model and the train step learns.

Reference behavior under test: each image expands to rows of [IMG] tokens
ending [IMG_BREAK], the last row ending [IMG_END]
(mm_plugin.py:760-781); features scatter onto the [IMG] positions only.
HF parity for the model itself lives in tests/test_pixtral_parity.py
(slow tier).
"""

import numpy as np

import jax
import jax.numpy as jnp

from iadr1_tpu.data.mm import expand_image_tokens
from iadr1_tpu.data.tokenize import IGNORE_INDEX
from iadr1_tpu.models.registry import bundle_from_hf_config

HF_CFG = dict(
    architectures=["LlavaForConditionalGeneration"],
    text_config=dict(
        model_type="mistral", vocab_size=160, hidden_size=48,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rope_theta=10000.0,
        tie_word_embeddings=False, sliding_window=None,
    ),
    vision_config=dict(
        model_type="pixtral", hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, image_size=64,
        patch_size=16, rope_theta=10000.0,
    ),
    image_token_index=7,
)
IMG_ID, BRK, END = 7, 150, 151


def test_pixtral_expansion_rows():
    messages = [
        {"role": "user", "content": "<image>what is this?"},
        {"role": "assistant", "content": "a defect"},
    ]
    out = expand_image_tokens(messages, [(2, 3)], "pixtral", "[IMG]")
    assert out[0]["content"] == (
        "[IMG][IMG][IMG][IMG_BREAK][IMG][IMG][IMG][IMG_END]what is this?"
    )


def test_pixtral_sft_step_trains():
    from PIL import Image

    from iadr1_tpu.data.collator import VLMBatchBuilder
    from iadr1_tpu.train import (
        OptimizerConfig,
        create_train_state,
        make_optimizer,
        make_sft_step,
    )

    bundle = bundle_from_hf_config(HF_CFG, attention="xla")
    assert bundle.family == "pixtral"
    params = bundle.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (40, 52, 3), np.uint8))
    patches, grid, seqlen = bundle.preprocess_image(img)
    gh, gw = grid
    img_run = []
    for r in range(gh):
        img_run += [IMG_ID] * gw + [BRK if r < gh - 1 else END]

    T = 40
    rows = []
    for i in range(2):
        prompt = [2] + img_run + list(rng.integers(10, 149, T - len(img_run) - 4))
        body = prompt + [8, 9, 1]
        labels = [IGNORE_INDEX] * len(prompt) + [8, 9, 1]
        rows.append({
            "input_ids": np.asarray(body, np.int64),
            "labels": np.asarray(labels, np.int64),
            "segment_ids": np.ones(T, np.int64),
            "position_ids": np.arange(T),
            "extras": [{"patches": [patches], "grid_thw": [grid]}],
        })
    builder = VLMBatchBuilder(bundle=bundle, patch_budget=2 * gh * gw + 4)
    batch = {k: jnp.asarray(v) for k, v in builder(rows).items()}

    opt, schedule = make_optimizer(
        OptimizerConfig(learning_rate=5e-3, total_steps=10, warmup_ratio=0.0)
    )
    state = create_train_state(params, opt)
    step = jax.jit(make_sft_step(bundle.forward, opt, schedule))
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
