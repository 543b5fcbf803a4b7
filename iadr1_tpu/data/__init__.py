"""Data pipeline: dataset registry, aligners, chat templates, supervised
tokenization, and TPU-friendly sequence packing.

Replaces the reference's llamafactory/data stack (parser -> loader ->
aligner -> template -> processors -> collator, SURVEY.md section 2.2) with a
functional pipeline that ends in fixed-shape, segment-id-packed batches --
the form XLA wants -- instead of 4-D attention masks and varlen patches.
"""

from iadr1_tpu.data.template import (
    ChatTemplate,
    TEMPLATES,
    get_template,
)
from iadr1_tpu.data.registry import DatasetAttr, load_dataset_registry
from iadr1_tpu.data.aligner import align_sharegpt, align_alpaca
from iadr1_tpu.data.tokenize import (
    IGNORE_INDEX,
    encode_supervised_example,
    infer_seqlen,
)
from iadr1_tpu.data.packing import greedy_knapsack, pack_examples
