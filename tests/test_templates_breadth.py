"""General-purpose chat templates: byte-exact goldens vs the reference
registrations (llamafactory/data/template.py:404-1133)."""

import pytest

from iadr1_tpu.data.template import TEMPLATES, get_template

from helpers import tiny_qwen_tokenizer

MSGS = [
    {"role": "user", "content": "Hi"},
    {"role": "assistant", "content": "Hello!"},
    {"role": "user", "content": "Bye"},
    {"role": "assistant", "content": "See ya"},
]


def render(name, system=None):
    return get_template(name).render_conversation(
        MSGS, system=system, eos_text="</s>", bos_text="<s>")


def test_llama2_system_inside_first_user():
    assert render("llama2", "SYS") == (
        "<s>[INST] <<SYS>>\nSYS\n<</SYS>>\n\nHi [/INST]Hello!</s>"
        "<s>[INST] Bye [/INST]See ya</s>"
    )
    # no system: plain INST turns
    assert render("llama2") == (
        "<s>[INST] Hi [/INST]Hello!</s><s>[INST] Bye [/INST]See ya</s>"
    )


def test_llama3():
    assert render("llama3", "SYS") == (
        "<s>"
        "<|start_header_id|>system<|end_header_id|>\n\nSYS<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nHi<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\nHello!<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nBye<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\nSee ya<|eot_id|>"
    )


def test_mistral():
    assert render("mistral", "SYS") == (
        "<s>SYS\n\n[INST] Hi[/INST] Hello!</s>[INST] Bye[/INST] See ya</s>"
    )


def test_gemma():
    assert render("gemma") == (
        "<s><start_of_turn>user\nHi<end_of_turn>\n"
        "<start_of_turn>model\nHello!<end_of_turn>\n"
        "<start_of_turn>user\nBye<end_of_turn>\n"
        "<start_of_turn>model\nSee ya<end_of_turn>\n"
    )


def test_qwen_default_system():
    assert render("qwen") == (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\nHi<|im_end|>\n"
        "<|im_start|>assistant\nHello!<|im_end|>\n"
        "<|im_start|>user\nBye<|im_end|>\n"
        "<|im_start|>assistant\nSee ya<|im_end|>\n"
    )


def test_zephyr_eos_in_user_slot():
    assert render("zephyr") == (
        "<|system|>\nYou are Zephyr, a helpful assistant.</s>"
        "<|user|>\nHi</s><|assistant|>\nHello!</s>"
        "<|user|>\nBye</s><|assistant|>\nSee ya</s>"
    )


def test_alpaca():
    assert render("alpaca") == (
        "Below is an instruction that describes a task. "
        "Write a response that appropriately completes the request.\n\n"
        "### Instruction:\nHi\n\n### Response:\nHello!</s>\n\n"
        "### Instruction:\nBye\n\n### Response:\nSee ya</s>\n\n"
    )


def test_deepseek3_and_glm4():
    assert render("deepseek3") == (
        "<s><｜User｜>Hi<｜Assistant｜>Hello!</s>"
        "<｜User｜>Bye<｜Assistant｜>See ya</s>"
    )
    assert render("glm4", "SYS") == (
        "[gMASK]<sop><|system|>\nSYS<|user|>\nHi<|assistant|>\nHello!</s>"
        "<|user|>\nBye<|assistant|>\nSee ya</s>"
    )


@pytest.mark.parametrize("name", sorted(TEMPLATES))
def test_every_template_encodes(name):
    """Every registered template renders, encodes per-turn, and produces a
    generation prompt without raising."""
    tok = tiny_qwen_tokenizer()
    tpl = get_template(name)
    pairs = tpl.encode_multiturn(tok, MSGS, system="S")
    assert len(pairs) == 2
    assert all(len(p) > 0 and len(r) > 0 for p, r in pairs)
    prompt = tpl.encode_prompt(tok, MSGS[:1], system="S")
    assert len(prompt) > 0


def test_second_batch_goldens():
    assert render("cohere", "SYS") == (
        "<s><|START_OF_TURN_TOKEN|><|SYSTEM_TOKEN|>SYS<|END_OF_TURN_TOKEN|>"
        "<|START_OF_TURN_TOKEN|><|USER_TOKEN|>Hi<|END_OF_TURN_TOKEN|>"
        "<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>Hello!</s>"
        "<|START_OF_TURN_TOKEN|><|USER_TOKEN|>Bye<|END_OF_TURN_TOKEN|>"
        "<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>See ya</s>"
    )
    assert render("exaone", "SYS") == (
        "[|system|]SYS[|endofturn|]\n[|user|]Hi\n[|assistant|]Hello!</s>\n"
        "[|user|]Bye\n[|assistant|]See ya</s>\n"
    )
    assert render("solar") == (
        "### User:\nHi\n\n### Assistant:\nHello!</s>"
        "### User:\nBye\n\n### Assistant:\nSee ya</s>"
    )
    assert render("ziya") == (
        "<human>:Hi\n<bot>:Hello!\n<human>:Bye\n<bot>:See ya\n"
    )
    assert render("atom") == (
        "<s>Human: Hi\n</s><s>Assistant:Hello!\n</s>"
        "<s>Human: Bye\n</s><s>Assistant:See ya\n</s>"
    )
