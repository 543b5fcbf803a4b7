"""Web UI ("LlamaBoard" counterpart): training form, run monitor, chat.

The reference ships a ~5.5k-LoC Gradio app (llamafactory/webui/: interface,
runner, chatter, components).  This TPU build keeps the same three
capabilities -- configure-and-launch a training run as a subprocess, stream
its trainer_log.jsonl progress, and chat with a checkpoint -- on the
Python standard library (http.server + a single-page HTML app), so the
framework has no Gradio dependency.
"""

from iadr1_tpu.webui.runner import Runner
from iadr1_tpu.webui.app import create_server, main
