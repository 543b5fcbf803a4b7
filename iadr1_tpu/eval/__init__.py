"""Six-benchmark evaluation harness (MVTec/DS-MVTec, VisA, DAGM, DTD, MPDD, SDD).

Behavior-compatible with the reference eval stack:
* scripts/Inference/IAD-R1-Inference/vLLM_Qwen_detect_format.py (drivers)
* GPT4/gpt4v.py parse_conversation (MCQ option handling)
* helper/summary.py caculate_accuracy_mmad (balanced-accuracy summaries)
"""

from iadr1_tpu.eval.mcq import parse_conversation, extract_option_answer
from iadr1_tpu.eval.summary import summarize_answers
