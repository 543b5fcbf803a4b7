"""Training stages: PA-SFT (masked-CE on Expert-AD CoT) and SC-GRPO.

Replaces the reference's trainer layer (CustomSeq2SeqTrainer over HF Trainer
+ DeepSpeed for SFT, SCGRPOTrainer + vLLM for RL; SURVEY.md sections 2.1-2.2)
with jit-compiled SPMD train steps over the (dp, fsdp, tp) mesh.
"""

from iadr1_tpu.train.state import TrainState, create_train_state
from iadr1_tpu.train.optimizers import make_optimizer, OptimizerConfig
from iadr1_tpu.train.sft import sft_loss, make_sft_step
from iadr1_tpu.train.grpo import GRPOConfig, GRPOTrainer
from iadr1_tpu.train.online_rl import (
    NashMDConfig,
    NashMDTrainer,
    OnlineDPOTrainer,
    RLOOTrainer,
    XPOConfig,
    XPOTrainer,
    rloo_advantages,
)
from iadr1_tpu.train.gkd import GKDConfig, GKDTrainer
from iadr1_tpu.train.preference import (
    BCOConfig,
    DPOConfig,
    KTOConfig,
    make_bco_step,
    make_dpo_step,
    make_kto_step,
    make_prm_step,
    make_rm_step,
)
from iadr1_tpu.train.sft import IterativeSFTTrainer
