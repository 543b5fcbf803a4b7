"""Chat templates for the model families in the IAD-R1 recipe.

The reference ships 97 slot-based templates (llamafactory/data/template.py);
the recipe itself uses a handful: ``qwen2_vl`` (chatml), ``llava_next_qwen``
(chatml, OneVision), ``llava``/``llava_next`` (vicuna-style), and
``llava_next_mistral``.  Rendered strings are byte-compatible with the
reference registrations (template.py:1121-1133, 899-913, 834-853, 887-896);
encoding follows the same per-message tokenize-with-no-special-tokens
discipline (template.py:102-159).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

# Sentinels for tokenizer-dependent special tokens inside slots.
EOS = object()
BOS = object()

Slot = "str | object"


@dataclasses.dataclass(frozen=True)
class ChatTemplate:
    name: str
    user: tuple = ("{content}",)
    assistant: tuple = ("{content}", EOS)
    system: tuple = ("{content}",)
    prefix: tuple = ()
    default_system: str = ""
    stop_words: tuple = ()
    image_token: str = "<image>"
    # how the mm front-end expands image placeholders; one of
    # "qwen2_vl" (vision_start/pad*N/vision_end), "llava" (single token or
    # anyres count), "plain"
    mm_style: str = "plain"
    # llama2-style: the rendered system block is prepended INSIDE the first
    # user message instead of standing alone (reference Llama2Template,
    # template.py:162-205)
    system_in_user: bool = False

    # --- rendering -------------------------------------------------------

    def _fill(self, slots: Sequence, content: str) -> list:
        out = []
        for slot in slots:
            if isinstance(slot, str):
                out.append(slot.replace("{content}", content))
            else:
                out.append(slot)
        return out

    def render_message(self, role: str, content: str, first: bool,
                       system: str | None) -> list:
        """Render one message to a list of str/EOS/BOS chunks."""
        chunks: list = []
        sys_text = ""
        if first:
            chunks += list(self.prefix)
            sys = system if system is not None else self.default_system
            if sys and self.system_in_user:
                sys_text = "".join(
                    s for s in self._fill(self.system, sys)
                    if isinstance(s, str)
                )
            elif sys:
                chunks += self._fill(self.system, sys)
        if role == "user":
            chunks += self._fill(self.user, sys_text + content)
        elif role == "assistant":
            chunks += self._fill(self.assistant, content)
        else:
            raise ValueError(f"unsupported role {role!r}")
        return chunks

    def render_conversation(
        self,
        messages: Sequence[dict],
        system: str | None = None,
        add_generation_prompt: bool = False,
        eos_text: str = "",
        bos_text: str = "",
    ) -> str:
        """Full conversation as a single string (rollout/eval prompt path).

        ``add_generation_prompt`` appends the user->assistant transition so
        the model continues as the assistant (mirrors HF
        apply_chat_template(add_generation_prompt=True) used by the eval
        drivers, vLLM_Qwen_detect_format.py:122-127).
        """
        text = []
        for i, msg in enumerate(messages):
            for chunk in self.render_message(
                msg["role"], msg["content"], i == 0, system
            ):
                if chunk is EOS:
                    text.append(eos_text)
                elif chunk is BOS:
                    text.append(bos_text)
                else:
                    text.append(chunk)
        if add_generation_prompt:
            # the user slot carries the assistant preamble after {content};
            # emit everything that follows the content placeholder
            tail = []
            seen = False
            for slot in self.user:
                if isinstance(slot, str) and "{content}" in slot:
                    tail.append(slot.rsplit("{content}", 1)[1])
                    seen = True
                elif seen and isinstance(slot, str):
                    tail.append(slot)
            if messages and messages[-1]["role"] == "user":
                pass  # transition already emitted by the user slot
            else:
                text += tail
        return "".join(text)

    # --- encoding --------------------------------------------------------

    def _encode_chunks(self, tokenizer, chunks: list) -> list[int]:
        ids: list[int] = []
        for chunk in chunks:
            if chunk is EOS:
                ids.append(tokenizer.eos_token_id)
            elif chunk is BOS:
                ids.append(tokenizer.bos_token_id)
            elif chunk:
                ids.extend(tokenizer.encode(chunk, add_special_tokens=False))
        return ids

    def encode_multiturn(
        self, tokenizer, messages: Sequence[dict], system: str | None = None
    ) -> list[tuple[list[int], list[int]]]:
        """[(prompt_ids, response_ids)] per user/assistant turn pair."""
        encoded = [
            self._encode_chunks(
                tokenizer,
                self.render_message(m["role"], m["content"], i == 0, system),
            )
            for i, m in enumerate(messages)
        ]
        if len(encoded) % 2:
            raise ValueError("conversation must alternate user/assistant")
        return [(encoded[i], encoded[i + 1]) for i in range(0, len(encoded), 2)]

    def encode_prompt(
        self, tokenizer, messages: Sequence[dict], system: str | None = None
    ) -> list[int]:
        """Token ids of the conversation with the generation preamble."""
        text = self.render_conversation(
            messages, system, add_generation_prompt=True,
            eos_text=tokenizer.eos_token or "",
            bos_text=tokenizer.bos_token or "",
        )
        return tokenizer.encode(text, add_special_tokens=False)


_CHATML_KW = dict(
    user=("<|im_start|>user\n{content}<|im_end|>\n<|im_start|>assistant\n",),
    assistant=("{content}<|im_end|>\n",),
    system=("<|im_start|>system\n{content}<|im_end|>\n",),
    default_system="You are a helpful assistant.",
    stop_words=("<|im_end|>",),
)

_VICUNA_SYSTEM = (
    "A chat between a curious user and an artificial intelligence assistant. "
    "The assistant gives helpful, detailed, and polite answers to the user's "
    "questions."
)

TEMPLATES: dict[str, ChatTemplate] = {}


def _register(template: ChatTemplate) -> None:
    TEMPLATES[template.name] = template


_register(ChatTemplate(name="qwen2_vl", image_token="<|image_pad|>",
                       mm_style="qwen2_vl", **_CHATML_KW))
_register(ChatTemplate(name="qwen2_5_vl", image_token="<|image_pad|>",
                       mm_style="qwen2_vl", **_CHATML_KW))
_register(ChatTemplate(name="llava_next_qwen", image_token="<image>",
                       mm_style="llava", **_CHATML_KW))
_register(ChatTemplate(name="chatml", **_CHATML_KW))
_register(
    ChatTemplate(
        name="llava",
        user=("USER: {content} ASSISTANT:",),
        default_system=_VICUNA_SYSTEM,
        image_token="<image>",
        mm_style="llava",
    )
)
_register(
    ChatTemplate(
        name="llava_next",
        user=("USER: {content} ASSISTANT:",),
        default_system=_VICUNA_SYSTEM,
        image_token="<image>",
        mm_style="llava",
    )
)
_register(
    ChatTemplate(
        name="llava_next_mistral",
        user=("[INST] {content}[/INST]",),
        assistant=(" {content}", EOS),
        system=("{content}\n\n",),
        prefix=(BOS,),
        image_token="<image>",
        mm_style="llava",
    )
)
_register(
    ChatTemplate(
        name="intern_vl",
        user=("<|im_start|>user\n{content}<|im_end|>\n<|im_start|>assistant\n",),
        assistant=("{content}<|im_end|>\n",),
        system=("<|im_start|>system\n{content}<|im_end|>\n",),
        prefix=(BOS,),
        stop_words=("<|im_end|>",),
        image_token="<IMG_CONTEXT>",
        mm_style="intern_vl",
    )
)


# --- general-purpose templates beyond the IAD-R1 recipe --------------------
# Rendered strings match the reference registrations byte-for-byte
# (llamafactory/data/template.py:404-1133); tool/function slots are out of
# scope (the recipe never calls tools).  Templates the reference marks
# efficient_eos keep the EOS chunk here: the label stream needs a
# terminator either way, and single-turn training is identical.

_register(ChatTemplate(
    name="default",
    user=("Human: {content}\nAssistant:",),
    assistant=("{content}", EOS, "\n"),
    system=("System: {content}\n",),
))
_register(ChatTemplate(
    name="empty",
    user=("{content}",),
    assistant=("{content}", EOS),
))
_register(ChatTemplate(
    name="alpaca",
    user=("### Instruction:\n{content}\n\n### Response:\n",),
    assistant=("{content}", EOS, "\n\n"),
    default_system=(
        "Below is an instruction that describes a task. "
        "Write a response that appropriately completes the request.\n\n"
    ),
))
_register(ChatTemplate(
    name="vicuna",
    user=("USER: {content} ASSISTANT:",),
    default_system=_VICUNA_SYSTEM,
))
_register(ChatTemplate(
    name="llama2",
    user=(BOS, "[INST] {content} [/INST]"),
    system=("<<SYS>>\n{content}\n<</SYS>>\n\n",),
    system_in_user=True,
))
_register(ChatTemplate(
    name="llama3",
    user=("<|start_header_id|>user<|end_header_id|>\n\n{content}<|eot_id|>"
          "<|start_header_id|>assistant<|end_header_id|>\n\n",),
    assistant=("{content}<|eot_id|>",),
    system=("<|start_header_id|>system<|end_header_id|>\n\n{content}<|eot_id|>",),
    prefix=(BOS,),
    stop_words=("<|eot_id|>", "<|eom_id|>"),
))
_register(ChatTemplate(
    name="mistral",
    user=("[INST] {content}[/INST]",),
    assistant=(" {content}", EOS),
    system=("{content}\n\n",),
    prefix=(BOS,),
))
_register(ChatTemplate(
    name="gemma",
    user=("<start_of_turn>user\n{content}<end_of_turn>\n<start_of_turn>model\n",),
    assistant=("{content}<end_of_turn>\n",),
    prefix=(BOS,),
))
_register(ChatTemplate(
    name="phi",
    user=("<|user|>\n{content}<|end|>\n<|assistant|>\n",),
    assistant=("{content}<|end|>\n",),
    system=("<|system|>\n{content}<|end|>\n",),
    stop_words=("<|end|>",),
))
_register(ChatTemplate(
    name="phi4",
    user=("<|im_start|>user<|im_sep|>{content}<|im_end|>"
          "<|im_start|>assistant<|im_sep|>",),
    assistant=("{content}<|im_end|>",),
    system=("<|im_start|>system<|im_sep|>{content}<|im_end|>",),
    stop_words=("<|im_end|>",),
))
_register(ChatTemplate(
    name="qwen",
    user=_CHATML_KW["user"],
    assistant=_CHATML_KW["assistant"],
    system=_CHATML_KW["system"],
    default_system="You are a helpful assistant.",
    stop_words=("<|im_end|>",),
))
_register(ChatTemplate(
    name="yi",
    user=_CHATML_KW["user"],
    assistant=_CHATML_KW["assistant"],
    system=_CHATML_KW["system"],
    stop_words=("<|im_end|>",),
))
_register(ChatTemplate(
    name="deepseek",
    user=("User: {content}\n\nAssistant:",),
    system=("{content}\n\n",),
    prefix=(BOS,),
))
_register(ChatTemplate(
    name="deepseek3",
    user=("<｜User｜>{content}<｜Assistant｜>",),
    prefix=(BOS,),
))
_register(ChatTemplate(
    name="baichuan2",
    user=("<reserved_106>{content}<reserved_107>",),
))
_register(ChatTemplate(
    name="zephyr",
    user=("<|user|>\n{content}", EOS, "<|assistant|>\n"),
    system=("<|system|>\n{content}", EOS),
    default_system="You are Zephyr, a helpful assistant.",
))
_register(ChatTemplate(
    name="openchat",
    user=("GPT4 Correct User: {content}", EOS, "GPT4 Correct Assistant:"),
    prefix=(BOS,),
))
_register(ChatTemplate(
    name="intern2",
    user=_CHATML_KW["user"],
    assistant=_CHATML_KW["assistant"],
    system=_CHATML_KW["system"],
    prefix=(BOS,),
    stop_words=("<|im_end|>",),
))
_register(ChatTemplate(
    name="glm4",
    user=("<|user|>\n{content}<|assistant|>",),
    assistant=("\n{content}", EOS),
    system=("<|system|>\n{content}",),
    prefix=("[gMASK]<sop>",),
    stop_words=("<|user|>", "<|observation|>"),
))
_register(ChatTemplate(
    name="olmo",
    user=("<|user|>\n{content}<|assistant|>\n",),
    prefix=(EOS,),
))
_register(ChatTemplate(
    name="falcon",
    user=("User: {content}\nFalcon:",),
    assistant=("{content}", EOS, "\n"),
))
_register(ChatTemplate(
    name="aquila",
    user=("Human: {content}###Assistant:",),
    assistant=("{content}###",),
    system=("System: {content}###",),
    default_system=(
        "A chat between a curious human and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite "
        "answers to the human's questions."
    ),
    stop_words=("</s>",),
))
_register(ChatTemplate(
    name="atom",
    user=(BOS, "Human: {content}\n", EOS, BOS, "Assistant:"),
    assistant=("{content}\n", EOS),
))
_register(ChatTemplate(
    name="breeze",
    user=("[INST] {content} [/INST] ",),
    prefix=(BOS,),
))
_register(ChatTemplate(
    name="cohere",
    user=("<|START_OF_TURN_TOKEN|><|USER_TOKEN|>{content}<|END_OF_TURN_TOKEN|>"
          "<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>",),
    system=("<|START_OF_TURN_TOKEN|><|SYSTEM_TOKEN|>{content}"
            "<|END_OF_TURN_TOKEN|>",),
    prefix=(BOS,),
))
_register(ChatTemplate(
    name="cpm",
    user=("<用户>{content}<AI>",),
    prefix=(BOS,),
))
_register(ChatTemplate(
    name="cpm3",
    user=_CHATML_KW["user"],
    assistant=_CHATML_KW["assistant"],
    system=_CHATML_KW["system"],
    prefix=(BOS,),
    stop_words=("<|im_end|>",),
))
_register(ChatTemplate(
    name="dbrx",
    user=_CHATML_KW["user"],
    assistant=_CHATML_KW["assistant"],
    system=_CHATML_KW["system"],
))
_register(ChatTemplate(
    name="exaone",
    user=("[|user|]{content}\n[|assistant|]",),
    assistant=("{content}", EOS, "\n"),
    system=("[|system|]{content}[|endofturn|]\n",),
))
_register(ChatTemplate(
    name="orion",
    user=("Human: {content}\n\nAssistant: ", EOS),
    prefix=(BOS,),
))
_register(ChatTemplate(
    name="solar",
    user=("### User:\n{content}\n\n### Assistant:\n",),
    system=("### System:\n{content}\n\n",),
))
_register(ChatTemplate(
    name="starchat",
    user=("<|user|>\n{content}<|end|>\n<|assistant|>",),
    assistant=("{content}<|end|>\n",),
    system=("<|system|>\n{content}<|end|>\n",),
    stop_words=("<|end|>",),
))
_register(ChatTemplate(
    name="telechat",
    user=("<_user>{content}<_bot>",),
    system=("<_system>{content}<_end>",),
))
_register(ChatTemplate(
    name="xverse",
    user=("Human: {content}\n\nAssistant: ",),
))
_register(ChatTemplate(
    name="yuan",
    user=("{content}<sep>",),
    assistant=("{content}<eod>\n",),
    stop_words=("<eod>",),
))
_register(ChatTemplate(
    name="ziya",
    user=("<human>:{content}\n<bot>:",),
    assistant=("{content}\n",),
))


def get_template(name: str) -> ChatTemplate:
    try:
        return TEMPLATES[name]
    except KeyError:
        raise KeyError(
            f"unknown template {name!r}; known: {sorted(TEMPLATES)}"
        ) from None
