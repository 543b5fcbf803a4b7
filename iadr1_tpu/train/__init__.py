"""Training stages: PA-SFT (masked-CE on Expert-AD CoT) and SC-GRPO.

Replaces the reference's trainer layer (CustomSeq2SeqTrainer over HF Trainer
+ DeepSpeed for SFT, SCGRPOTrainer + vLLM for RL; SURVEY.md sections 2.1-2.2)
with jit-compiled SPMD train steps over the (dp, fsdp, tp) mesh.
"""

from iadr1_tpu.train.state import TrainState, create_train_state
from iadr1_tpu.train.optimizers import make_optimizer, OptimizerConfig
from iadr1_tpu.train.sft import sft_loss, make_sft_step
