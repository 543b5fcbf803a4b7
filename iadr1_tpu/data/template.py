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
        if first:
            chunks += list(self.prefix)
            sys = system if system is not None else self.default_system
            if sys:
                chunks += self._fill(self.system, sys)
        if role == "user":
            chunks += self._fill(self.user, content)
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


def get_template(name: str) -> ChatTemplate:
    try:
        return TEMPLATES[name]
    except KeyError:
        raise KeyError(
            f"unknown template {name!r}; known: {sorted(TEMPLATES)}"
        ) from None
