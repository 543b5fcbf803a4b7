"""Pallas TPU kernels for the hot ops.

Replaces the reference's CUDA kernel dependencies (flash-attn 2.7.0 for
training attention + varlen packing, SURVEY.md section 2.4) with first-party
Pallas kernels: flash attention with segment-id packing support and a custom
VJP, selected automatically on TPU with an XLA fallback elsewhere.
"""

from iadr1_tpu.kernels.flash_attention import flash_attention
