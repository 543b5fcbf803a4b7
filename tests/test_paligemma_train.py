"""PaliGemma SFT trainability: the strip-and-prepend data path (mm_style
"paligemma") feeds the prefix-LM model and the train step learns.

Reference behavior under test: the paligemma mm plugin strips placeholders
from the text and prepends the image-token run at the TOKEN level with
IGNORE labels (mm_plugin.py:693-712 process_messages/process_token_ids);
training unmasks attention over the prepended prefix (token_type_ids==0
columns, modeling_paligemma.py _update_causal_mask).  HF parity for the
model itself lives in tests/test_paligemma_parity.py (slow tier).
"""

import numpy as np

import jax
import jax.numpy as jnp

from iadr1_tpu.data.mm import expand_image_tokens, prepend_image_tokens
from iadr1_tpu.data.tokenize import IGNORE_INDEX
from iadr1_tpu.models.registry import make_paligemma_bundle

HF_CFG = dict(
    architectures=["PaliGemmaForConditionalGeneration"],
    text_config=dict(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=10000.0, tie_word_embeddings=True,
    ),
    vision_config=dict(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        projection_dim=48,
    ),
    image_token_index=7,
)
SEQLEN = 4  # (28 // 14) ** 2


def test_paligemma_strip_and_prepend():
    messages = [
        {"role": "user", "content": "<image>what is this?"},
        {"role": "assistant", "content": "a defect"},
    ]
    out = expand_image_tokens(messages, [SEQLEN], "paligemma", "<image>")
    assert out[0]["content"] == "what is this?"  # placeholder stripped

    ids, labels = prepend_image_tokens([2, 11, 12], [IGNORE_INDEX, 11, 12],
                                       [SEQLEN], 7)
    assert ids == [7] * SEQLEN + [2, 11, 12]  # run ahead of BOS
    assert labels == [IGNORE_INDEX] * (SEQLEN + 1) + [11, 12]

    ids, labels = prepend_image_tokens([2, 5], None, [SEQLEN], 7)
    assert labels is None and ids[:SEQLEN] == [7] * SEQLEN


def test_paligemma_sft_step_trains():
    from PIL import Image

    from iadr1_tpu.data.collator import VLMBatchBuilder
    from iadr1_tpu.train import (
        OptimizerConfig,
        create_train_state,
        make_optimizer,
        make_sft_step,
    )

    bundle = make_paligemma_bundle(HF_CFG, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (40, 52, 3), np.uint8))
    patches, grid, seqlen = bundle.preprocess_image(img)
    assert seqlen == SEQLEN

    T = 24
    rows = []
    for i in range(2):
        text = rng.integers(10, 120, T - SEQLEN - 4)
        body = [2] + list(text) + [8, 9, 1]          # bos + prompt + answer
        ids, labels = prepend_image_tokens(
            body, [IGNORE_INDEX] * (len(body) - 3) + [8, 9, 1],
            [seqlen], HF_CFG["image_token_index"],
        )
        rows.append({
            "input_ids": np.asarray(ids, np.int64),
            "labels": np.asarray(labels, np.int64),
            "segment_ids": np.ones(T, np.int64),
            "position_ids": np.arange(T),
            "extras": [{"patches": [patches], "grid_thw": [grid]}],
        })
    builder = VLMBatchBuilder(bundle=bundle, patch_budget=2 * SEQLEN)
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
