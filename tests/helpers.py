"""Shared test fixtures: a tiny locally-trained tokenizer with Qwen-style
special tokens (no network access in this environment)."""

import functools


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
