"""IAD-R1 TPU: a TPU-native two-stage post-training framework for
vision-language models applied to industrial anomaly detection.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the same
capabilities as the CUDA/torch reference Yanhui-Lee/IAD-R1:

* PA-SFT  -- perception-activation supervised fine-tuning on Expert-AD
  chain-of-thought data (reference: train/stage_sft, vendored LLaMA-Factory).
* SC-GRPO -- structured-control group-relative policy optimization with
  IAD-specific rewards (reference: train/stage_rl/trainer/sc_grpo_trainer.py).
* Eval    -- six-benchmark MCQ harness with balanced-accuracy summaries
  (reference: scripts/Inference, helper/summary.py).

Compute path is pure JAX: SPMD over a (dp, fsdp, tp) device mesh, Pallas
flash-attention kernels, one jit-compiled program for rollout + update.
"""

__version__ = "0.1.0"
