"""Command-line entry points mirroring the reference launch surface:

* ``python -m iadr1_tpu.cli.train_sft``  ~ scripts/train/PA_SFT/*.sh
* ``python -m iadr1_tpu.cli.train_grpo`` ~ scripts/train/SC_GRPO/*.sh
* ``python -m iadr1_tpu.cli.infer``      ~ scripts/Inference/*.sh
* ``python -m iadr1_tpu.cli.summarize``  ~ helper/summary.py CLI
"""
