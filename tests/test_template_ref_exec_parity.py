"""Template parity by EXECUTING the reference encoder.

For every one of the 78 reference-registered templates, encode the same
multi-turn conversation through the reference's Template.encode_multiturn
(llamafactory/data/template.py, run in-place from /root/reference) and
through ours, on the same locally-trained tiny tokenizer, and compare the
decoded byte streams per turn.  This upgrades the handwritten goldens in
test_templates_breadth.py to machine-checked parity against the real
implementation.

Known, documented divergence: templates the reference marks
``efficient_eos`` carry no EOS inside the turn encodings there (the
dataset processor appends one terminator later); our renderer keeps the
EOS chunk (module note in data/template.py).  The comparison strips the
eos token text for those templates.
"""

import os
import sys

import pytest

pytestmark = pytest.mark.slow  # executes the reference template engine over 78 templates

from iadr1_tpu.data.template import TEMPLATES as OUR_TEMPLATES, get_template

from helpers import tiny_qwen_tokenizer

REF_ROOT = "/root/reference/train/stage_sft"

if not os.path.isdir(REF_ROOT):  # pragma: no cover
    pytest.skip("reference tree not mounted", allow_module_level=True)


@pytest.fixture(scope="module")
def ref_templates():
    sys.path.insert(0, REF_ROOT)
    sys.path.insert(0, "/root/reference/trl")
    try:
        from llamafactory.data.template import TEMPLATES as REF
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference template module not importable: {e}")
    return REF


def _token_slot_strings(ref_tpl) -> list[str]:
    """All {"token": X} slot strings of a reference template (they encode
    via convert_tokens_to_ids there, so the tokenizer must know them)."""
    out = []
    for fmt in (ref_tpl.format_user, ref_tpl.format_assistant,
                ref_tpl.format_system, ref_tpl.format_observation,
                ref_tpl.format_prefix):
        for slot in getattr(fmt, "slots", []):
            if isinstance(slot, dict) and "token" in slot:
                out.append(slot["token"])
    return out


@pytest.fixture(scope="module")
def tok(ref_templates):
    tok = tiny_qwen_tokenizer()
    specials = set()
    for tpl in ref_templates.values():
        specials.update(_token_slot_strings(tpl))
    tok.add_tokens(sorted(specials))
    # a real BOS so {"bos_token"} prefix slots are exercised on both sides
    tok.add_special_tokens({"bos_token": "<s>"})
    return tok


MSGS = [
    {"role": "user", "content": "Is there a defect?"},
    {"role": "assistant", "content": "No, the surface is clean."},
    {"role": "user", "content": "Check again please."},
    {"role": "assistant", "content": "Still no defect."},
]


def _decode_pairs(tok, pairs):
    return [(tok.decode(p), tok.decode(r)) for p, r in pairs]


def _strip_eos(pairs_text, eos_text):
    return [(p.replace(eos_text, ""), r.replace(eos_text, ""))
            for p, r in pairs_text]


@pytest.mark.parametrize("system", ["SYS", None], ids=["system", "default"])
def test_all_templates_match_executed_reference(ref_templates, tok, system):
    eos_text = tok.eos_token or ""
    mismatches = []
    for name, ref_tpl in sorted(ref_templates.items()):
        ours = get_template(name)
        ref_pairs = ref_tpl.encode_multiturn(
            tok, MSGS, system=system or "", tools=""
        )
        our_pairs = ours.encode_multiturn(tok, MSGS, system=system)
        ref_text = _decode_pairs(tok, ref_pairs)
        our_text = _decode_pairs(tok, our_pairs)
        if ref_tpl.efficient_eos:
            ref_text = _strip_eos(ref_text, eos_text)
            our_text = _strip_eos(our_text, eos_text)
        if ref_text != our_text:
            mismatches.append((name, ref_text, our_text))
    assert not mismatches, "\n\n".join(
        f"--- {n}\nref:  {r}\nours: {o}" for n, r, o in mismatches[:5]
    ) + f"\n({len(mismatches)} mismatching templates)"


def test_registry_names_match_reference(ref_templates):
    missing = sorted(set(ref_templates) - set(OUR_TEMPLATES))
    assert not missing, missing


def test_custom_template_matches_executed_docstring_example(
    ref_templates, tok
):
    """The reference never registers "custom" -- it is the
    _register_template docstring example (template.py:236-243).  EXECUTE
    that example against the reference engine and byte-compare with our
    shipped "custom" template."""
    from llamafactory.data.formatter import EmptyFormatter, StringFormatter
    from llamafactory.data.template import TEMPLATES as REF, _register_template

    assert "custom" not in ref_templates
    try:
        _register_template(
            name="custom",
            format_user=StringFormatter(slots=["<user>{{content}}\n<model>"]),
            format_assistant=StringFormatter(slots=["{{content}}</s>\n"]),
            format_prefix=EmptyFormatter(slots=["<s>"]),
        )
        ref_tpl = REF["custom"]
        ours = get_template("custom")
        ref_text = _decode_pairs(
            tok, ref_tpl.encode_multiturn(tok, MSGS, system="", tools=""))
        our_text = _decode_pairs(tok, ours.encode_multiturn(tok, MSGS))
        assert ref_text == our_text
    finally:
        REF.pop("custom", None)
