"""Shared test fixtures: a tiny locally-trained tokenizer with Qwen-style
special tokens, a tiny Qwen2-VL HF checkpoint builder, and synthetic
Expert-AD-style data (no network access in this environment)."""

import functools
import json

import numpy as np


@functools.lru_cache(maxsize=None)
def tiny_qwen_tokenizer():
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    corpus = [
        "You are a helpful assistant.",
        "Are there any defects in the image?",
        "<think>reasoning here</think><answer>No</answer>",
        "<location>top left</location><type>scratch</type>",
        "The quick brown fox jumps over the lazy dog 0123456789",
        "USER: hi ASSISTANT: hello",
    ] * 4
    trainer = trainers.BpeTrainer(
        vocab_size=512,
        special_tokens=[
            "<|endoftext|>", "<|im_start|>", "<|im_end|>",
            "<|vision_start|>", "<|vision_end|>", "<|image_pad|>",
            "<image>",
        ],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(corpus, trainer)
    return PreTrainedTokenizerFast(
        tokenizer_object=tok,
        eos_token="<|im_end|>",
        pad_token="<|endoftext|>",
        additional_special_tokens=[
            "<|im_start|>", "<|vision_start|>", "<|vision_end|>",
            "<|image_pad|>", "<image>",
        ],
    )


def build_tiny_vlm_checkpoint(dirpath: str) -> str:
    """Write a tiny Qwen2-VL HF checkpoint (config+safetensors+tokenizer)."""
    import torch
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    tok = tiny_qwen_tokenizer()
    tok.save_pretrained(dirpath)
    ids = {
        "image_token_id": tok.convert_tokens_to_ids("<|image_pad|>"),
        "vision_start_token_id": tok.convert_tokens_to_ids("<|vision_start|>"),
        "vision_end_token_id": tok.convert_tokens_to_ids("<|vision_end|>"),
        "video_token_id": 0,
    }
    torch.manual_seed(0)
    cfg = Qwen2VLConfig(
        vision_config=dict(
            depth=2, embed_dim=32, hidden_size=64, num_heads=4,
            patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
        ),
        text_config=dict(
            vocab_size=max(tok.vocab_size, 600), hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-6, rope_theta=10000.0, tie_word_embeddings=True,
            max_position_embeddings=512,
            rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
        ),
        **ids,
    )
    Qwen2VLForConditionalGeneration(cfg).save_pretrained(dirpath)
    return dirpath


def build_tiny_moe_checkpoint(dirpath: str) -> str:
    """Write a tiny Qwen2-MoE HF checkpoint (config+safetensors+tokenizer)."""
    import torch
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    tok = tiny_qwen_tokenizer()
    tok.save_pretrained(dirpath)
    torch.manual_seed(0)
    cfg = Qwen2MoeConfig(
        vocab_size=max(tok.vocab_size, 600), hidden_size=64,
        intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-6, rope_theta=10000.0, tie_word_embeddings=True,
        max_position_embeddings=512,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
        shared_expert_intermediate_size=80, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[],
    )
    Qwen2MoeForCausalLM(cfg).save_pretrained(dirpath)
    return dirpath


def build_iad_sft_dataset(dirpath) -> tuple[str, str]:
    """Synthetic Expert-AD-style sharegpt JSON + images -> (json, img_dir)."""
    import os

    from PIL import Image

    img_dir = os.path.join(str(dirpath), "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(12):
        name = f"img_{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (56, 56, 3), np.uint8)
        ).save(os.path.join(img_dir, name))
        anomalous = i % 2 == 0
        answer = (
            "<think>inspecting surface</think><location>top left</location>"
            "<type>scratch</type><answer>Yes</answer>"
            if anomalous
            else "<think>looks clean</think><answer>No</answer>"
        )
        rows.append({
            "messages": [
                {"role": "user",
                 "content": "<image>Are there any defects in the image?"},
                {"role": "assistant", "content": answer},
            ],
            "images": [name],
        })
    path = os.path.join(str(dirpath), "expert_ad.json")
    with open(path, "w") as f:
        json.dump(rows, f)
    return path, img_dir


def build_iad_rl_dataset(dirpath) -> tuple[str, str]:
    """Synthetic RL JSON ({image, problem, solution}) + images."""
    import os

    from PIL import Image

    img_dir = os.path.join(str(dirpath), "rl_images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(1)
    rows = []
    for i in range(8):
        name = f"rl_{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (56, 56, 3), np.uint8)
        ).save(os.path.join(img_dir, name))
        anomalous = i % 2 == 0
        solution = (
            "<think>g</think><location>top</location><type>scratch</type>"
            "<answer>Yes</answer>"
            if anomalous else "<answer>No</answer>"
        )
        rows.append({
            "image": name,
            "problem": "Are there any defects in the image?",
            "solution": solution,
        })
    path = os.path.join(str(dirpath), "rl_data.json")
    with open(path, "w") as f:
        json.dump(rows, f)
    return path, img_dir


def build_benchmark_json(dirpath, n=8, templates=0) -> tuple[str, str]:
    """Synthetic test_*_format.json benchmark + images.

    ``templates`` > 0 writes that many normal-sample template images per
    item and lists them in similar_templates/random_templates (the
    reference few-shot flow, vLLM_Qwen_detect_format.py:88-128)."""
    import os

    from PIL import Image

    img_root = os.path.join(str(dirpath), "bench_images")
    rng = np.random.default_rng(2)
    data = {}
    for i in range(n):
        normal = i % 2 == 0
        rel = f"TinyDS/cls/{'good' if normal else 'defect'}/{i}.png"
        full = os.path.join(img_root, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        Image.fromarray(
            rng.integers(0, 255, (56, 56, 3), np.uint8)
        ).save(full)
        tpl_rels = []
        for t in range(templates):
            tpl_rel = f"TinyDS/cls/good/tpl_{i}_{t}.png"
            tpl_full = os.path.join(img_root, tpl_rel)
            os.makedirs(os.path.dirname(tpl_full), exist_ok=True)
            Image.fromarray(
                rng.integers(0, 255, (56, 56, 3), np.uint8)
            ).save(tpl_full)
            tpl_rels.append(tpl_rel)
        data[rel] = {
            "image_path": rel,
            "conversation": [{
                "Question": "Are there any defects in the query image?",
                "Answer": "B" if normal else "A",
                "Options": {"A": "Yes.", "B": "No."},
                "type": "Anomaly Detection",
            }],
            "similar_templates": tpl_rels,
            "random_templates": tpl_rels,
        }
    path = os.path.join(str(dirpath), "test_TinyDS_format.json")
    with open(path, "w") as f:
        json.dump(data, f)
    return path, img_root
