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
    # mistral routes through the reference's Llama2Template
    # (template.py:245): the system block renders INSIDE the first [INST]
    assert render("mistral", "SYS") == (
        "<s>[INST] SYS\n\nHi[/INST] Hello!</s>[INST] Bye[/INST] See ya</s>"
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


def test_round3_breadth_goldens():
    """Third batch (the remaining reference names; template.py:404-1330)."""
    assert render("baichuan") == (
        "<reserved_102>Hi<reserved_103>Hello!</s>"
        "<reserved_102>Bye<reserved_103>See ya</s>"
    )
    assert render("chatglm2") == (
        "[gMASK]sop[Round 0]\n\n问：Hi\n\n答：Hello!</s>"
        "[Round 1]\n\n问：Bye\n\n答：See ya</s>"
    )
    assert render("chatglm3", "SYS") == (
        "[gMASK]sop<|system|>\nSYS<|user|>\nHi<|assistant|>\nHello!</s>"
        "<|user|>\nBye<|assistant|>\nSee ya</s>"
    )
    assert render("deepseekcoder") == (
        "<s>You are an AI programming assistant, utilizing the DeepSeek "
        "Coder model, developed by DeepSeek Company, and you only answer "
        "questions related to computer science. For politically sensitive "
        "questions, security and privacy issues, and other non-computer "
        "science questions, you will refuse to answer.\n"
        "### Instruction:\nHi\n### Response:\nHello!\n<|EOT|>\n"
        "### Instruction:\nBye\n### Response:\nSee ya\n<|EOT|>\n"
    )
    assert render("granite3", "SYS") == (
        "<|start_of_role|>system<|end_of_role|>SYS<|end_of_text|>\n"
        "<|start_of_role|>user<|end_of_role|>Hi<|end_of_text|>\n"
        "<|start_of_role|>assistant<|end_of_role|>Hello!<|end_of_text|>\n"
        "<|start_of_role|>user<|end_of_role|>Bye<|end_of_text|>\n"
        "<|start_of_role|>assistant<|end_of_role|>See ya<|end_of_text|>\n"
    )
    assert render("intern", "SYS") == (
        "<s><|System|>:SYS\n<|User|>:Hi\n<|Bot|>:Hello!<eoa>\n"
        "<|User|>:Bye\n<|Bot|>:See ya<eoa>\n"
    )
    assert render("llama2_zh", "SYS") == (
        "<s>[INST] <<SYS>>\nSYS\n<</SYS>>\n\nHi [/INST]Hello!</s>"
        "<s>[INST] Bye [/INST]See ya</s>"
    )
    assert render("openchat-3.6") == (
        "<s><|start_header_id|>GPT4 Correct User<|end_header_id|>\n\nHi"
        "<|eot_id|><|start_header_id|>GPT4 Correct Assistant"
        "<|end_header_id|>\n\nHello!</s>"
        "<|start_header_id|>GPT4 Correct User<|end_header_id|>\n\nBye"
        "<|eot_id|><|start_header_id|>GPT4 Correct Assistant"
        "<|end_header_id|>\n\nSee ya</s>"
    )
    assert render("pixtral", "SYS") == (
        "<s>[INST]SYS\n\nHi[/INST]Hello!</s>[INST]Bye[/INST]See ya</s>"
    )
    assert render("sailor") == (
        "<|im_start|>system\nYou are an AI assistant named Sailor created "
        "by Sea AI Lab. Your answer should be friendly, unbiased, faithful, "
        "informative and detailed.<|im_end|>\n"
        "<|im_start|>question\nHi<|im_end|>\n<|im_start|>answer\nHello!"
        "<|im_end|>\n"
        "<|im_start|>question\nBye<|im_end|>\n<|im_start|>answer\nSee ya"
        "<|im_end|>\n"
    )
    assert render("telechat2", "SYS") == (
        "<_system>SYS<_user>Hi<_bot>Hello!</s><_user>Bye<_bot>See ya</s>"
    )
    assert render("yayi", "SYS") == (
        "<|System|>:\nSYS\n\n<|Human|>:\nHi\n\n<|YaYi|>:Hello!\n\n"
        "<|Human|>:\nBye\n\n<|YaYi|>:See ya\n\n"
    )
    assert render("yi_vl") == (
        "This is a chat between an inquisitive human and an AI assistant. "
        "Assume the role of the AI assistant. Read all the images carefully, "
        "and respond to the human's questions with informative, helpful, "
        "detailed and polite answers. "
        "这是一个好奇的人类和一个人工智能助手之间的对话。假设你扮演这个AI助手的角色。"
        "仔细阅读所有的图像，并对人类的问题做出信息丰富、有帮助、详细的和礼貌的回答。"
        "\n\n"
        "### Human: Hi\n### Assistant:Hello!\n"
        "### Human: Bye\n### Assistant:See ya\n"
    )
    assert render("index", "SYS") == (
        "<unk>SYSreserved_0Hireserved_1Hello!</s>"
        "reserved_0Byereserved_1See ya</s>"
    )
    assert render("phi_small", "SYS") == (
        "<|system|>\nSYS<|end|>\n<|user|>\nHi<|end|>\n<|assistant|>\n"
        "Hello!<|end|>\n<|user|>\nBye<|end|>\n<|assistant|>\nSee ya<|end|>\n"
    )


def test_all_reference_names_registered():
    """Every template name the reference registers exists here (78 names,
    `grep _register_template -A2 | name=` over the reference file)."""
    ref_names = [
        "alpaca", "aquila", "atom", "baichuan", "baichuan2", "belle",
        "bluelm", "breeze", "chatglm2", "chatglm3", "chatml", "chatml_de",
        "codegeex2", "codegeex4", "cohere", "cpm", "cpm3", "dbrx",
        "deepseek", "deepseek3", "deepseekcoder", "default", "empty",
        "exaone", "falcon", "fewshot", "gemma", "glm4", "granite3",
        "index", "intern", "intern2", "intern3", "intern_vl", "llama2",
        "llama2_zh", "llama3", "llava", "llava_next", "llava_next_llama3",
        "llava_next_mistral", "llava_next_qwen", "llava_next_video",
        "llava_next_video_mistral", "llava_next_video_yi", "llava_next_yi",
        "marco", "minicpm_v", "mistral", "mllama", "olmo", "openchat",
        "openchat-3.6", "opencoder", "orion", "paligemma", "phi",
        "phi_small", "phi4", "pixtral", "qwen", "qwen2_vl", "sailor",
        "skywork_o1", "solar", "starchat", "telechat", "telechat2",
        "vicuna", "video_llava", "xuanyuan", "xverse", "yayi", "yi",
        "yi_vl", "yuan", "zephyr", "ziya",
    ]
    missing = [n for n in ref_names if n not in TEMPLATES]
    assert not missing, missing
    assert len(ref_names) == 78


def test_tool_styles():
    """ToolFormatter/FunctionFormatter counterparts (data/tools.py vs
    reference tool_utils.py): prompt contracts, call syntax, extraction."""
    import json

    from iadr1_tpu.data.tools import (
        FunctionCall,
        get_tool_style,
        render_function_content,
        render_tools_content,
    )

    tools = [{
        "name": "get_weather",
        "description": "Get the weather",
        "parameters": {
            "type": "object",
            "properties": {
                "city": {"type": "string", "description": "the city"},
                "unit": {"type": "string", "enum": ["C", "F"]},
            },
            "required": ["city"],
        },
    }]
    call_json = json.dumps(
        [{"name": "get_weather", "arguments": {"city": "Paris"}}]
    )

    # default: ReAct Action/Action Input (tool_utils.py:97-160)
    d = get_tool_style("default")
    desc = render_tools_content(d, tools)
    assert "You have access to the following tools:" in desc
    assert "> Tool Name: get_weather" in desc
    assert "- city (string, required): the city" in desc
    assert "- unit (string): , should be one of [C, F]" in desc
    rendered = render_function_content(d, call_json)
    assert rendered == 'Action: get_weather\nAction Input: {"city": "Paris"}\n'
    assert d.extract(rendered) == [
        FunctionCall("get_weather", '{"city": "Paris"}')
    ]

    # qwen: <tools> signatures + <tool_call> json (tool_utils.py:289-351)
    q = get_tool_style("qwen")
    desc = render_tools_content(q, tools)
    assert desc.startswith("\n\n# Tools\n\n")
    assert '"type": "function"' in desc and "<tools>" in desc
    rendered = render_function_content(q, call_json)
    assert rendered == (
        '<tool_call>\n{"name": "get_weather", "arguments": '
        '{"city": "Paris"}}\n</tool_call>'
    )
    assert q.extract(rendered) == [
        FunctionCall("get_weather", '{"city": "Paris"}')
    ]

    # llama3: JSON function calling w/ date header (tool_utils.py:203-241)
    l3 = get_tool_style("llama3")
    desc = l3.describe_tools(tools, date="01 Jan 2026")
    assert desc.startswith(
        "Cutting Knowledge Date: December 2023\nToday Date: 01 Jan 2026"
    )
    rendered = render_function_content(l3, call_json)
    assert rendered == (
        '{"name": "get_weather", "parameters": {"city": "Paris"}}'
    )
    assert l3.extract(rendered) == [
        FunctionCall("get_weather", '{"city": "Paris"}')
    ]

    # mistral: [AVAILABLE_TOOLS] + json list calls (tool_utils.py:243-286)
    m = get_tool_style("mistral")
    desc = render_tools_content(m, tools)
    assert desc.startswith("[AVAILABLE_TOOLS] ") and desc.endswith(
        "[/AVAILABLE_TOOLS]"
    )
    rendered = render_function_content(m, call_json)
    assert rendered == '[{"name": "get_weather", "arguments": {"city": "Paris"}}]'
    assert m.extract(rendered) == [
        FunctionCall("get_weather", '{"city": "Paris"}')
    ]

    # glm4: markdown tool docs + name\nargs calls (tool_utils.py:163-200)
    g = get_tool_style("glm4")
    desc = render_tools_content(g, tools)
    assert "## get_weather" in desc and desc.startswith("你是一个名为 ChatGLM")
    rendered = render_function_content(g, call_json)
    assert rendered == 'get_weather\n{"city": "Paris"}'
    assert g.extract(rendered) == [
        FunctionCall("get_weather", '{"city": "Paris"}')
    ]


def test_tools_in_conversation_and_function_role():
    """Tools fold into the system block; function/observation roles render
    through the template's tool slots (reference Template._encode:120-134)."""
    import json

    tpl = get_template("qwen")
    tools = [{
        "name": "f",
        "description": "d",
        "parameters": {"type": "object", "properties": {}},
    }]
    msgs = [
        {"role": "user", "content": "Hi"},
        {"role": "function", "content": json.dumps(
            {"name": "f", "arguments": {}})},
        {"role": "observation", "content": "42"},
        {"role": "assistant", "content": "Done"},
    ]
    text = tpl.render_conversation(msgs, system="S", tools=tools,
                                   eos_text="</s>")
    assert text.startswith("<|im_start|>system\nS\n\n# Tools")
    assert '<tool_call>\n{"name": "f", "arguments": {}}\n</tool_call>' in text
    assert "<tool_response>\n42\n</tool_response>" in text
    assert text.endswith("<|im_start|>assistant\nDone<|im_end|>\n")

    # mistral folds tools into the first [INST] via Llama2Template
    tpl = get_template("mistral")
    text = tpl.render_conversation(
        [{"role": "user", "content": "Hi"},
         {"role": "assistant", "content": "Yo"}],
        tools=tools, eos_text="</s>", bos_text="<s>")
    assert text.startswith("<s>[INST] [AVAILABLE_TOOLS] ")
    assert "[/AVAILABLE_TOOLS]\n\nHi[/INST]" in text
