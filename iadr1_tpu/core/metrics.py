"""Throughput/MFU accounting.

The reference logs effective tokens/sec (llamafactory extras/misc.py
calculate_tps, train/sft/workflow.py:103-106); here tokens/sec/chip and MFU
are first-class, with an analytic FLOPs model for decoder transformers.
"""

from __future__ import annotations

import dataclasses

# Peak bf16 FLOP/s per chip.
PEAK_FLOPS = {
    # bf16 peaks per chip. v5e is 197 TFLOPs bf16 (394 is the *int8* TOPS
    # figure -- round 1 used it by mistake, halving every reported MFU;
    # confirmed empirically: clean [896]-contraction bf16 matmuls sustain
    # ~145 TF/s on this chip, impossible at 394 peak being 37%).
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6e": 918e12,
    "cpu": 1e12,  # nominal, for smoke runs
}


def transformer_flops_per_token(
    hidden: int,
    intermediate: int,
    num_layers: int,
    vocab: int,
    seq_len: int,
    num_heads: int | None = None,
    num_kv_heads: int | None = None,
    head_dim: int | None = None,
) -> float:
    """Forward FLOPs per token (multiply by 3 for fwd+bwd).

    2*params matmul FLOPs + attention score/value FLOPs (causal halves the
    effective window).
    """
    if head_dim is None:
        head_dim = hidden // (num_heads or 1)
    q_dim = (num_heads or hidden // head_dim) * head_dim
    kv_dim = (num_kv_heads or num_heads or hidden // head_dim) * head_dim
    per_layer = 2 * hidden * (q_dim + 2 * kv_dim)        # qkv proj
    per_layer += 2 * q_dim * hidden                      # o proj
    per_layer += 3 * 2 * hidden * intermediate           # gate/up/down
    per_layer += 2 * 2 * q_dim * (seq_len / 2)           # qk^T and pv, causal
    total = num_layers * per_layer
    total += 2 * hidden * vocab                          # lm head
    return float(total)


def vit_flops_per_patch(
    hidden: int,
    intermediate: int,
    num_layers: int,
    attn_window: int,
) -> float:
    """Forward FLOPs per ViT patch (qkv/o + MLP + windowed attention)."""
    per_layer = 2 * hidden * hidden * 4            # qkv + o proj
    per_layer += 2 * 2 * hidden * intermediate     # MLP (2 matmuls)
    per_layer += 2 * 2 * hidden * attn_window      # qk^T + pv, full window
    return float(num_layers * per_layer)


@dataclasses.dataclass
class ThroughputMeter:
    """Accumulates step timings -> tokens/sec/chip and MFU."""

    flops_per_token_fwd: float
    n_chips: int = 1
    chip: str = "v5e"
    backward: bool = True

    tokens: int = 0
    seconds: float = 0.0

    def update(self, n_tokens: int, dt: float) -> None:
        self.tokens += n_tokens
        self.seconds += dt

    @property
    def tokens_per_sec_per_chip(self) -> float:
        if self.seconds == 0:
            return 0.0
        return self.tokens / self.seconds / self.n_chips

    @property
    def mfu(self) -> float:
        mult = 3.0 if self.backward else 1.0
        peak = PEAK_FLOPS.get(self.chip, PEAK_FLOPS["v5e"])
        return self.tokens_per_sec_per_chip * self.flops_per_token_fwd * mult / peak
