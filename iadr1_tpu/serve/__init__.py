"""Serving: OpenAI-compatible chat API over the rollout engine.

Replaces the reference's serving stack (llamafactory/api/app.py FastAPI
server + chat/ ChatModel engines, SURVEY.md section 2.2) with a
dependency-free stdlib HTTP server over the same VLMGenerator the eval
harness uses.
"""

from iadr1_tpu.serve.api import ChatServer
