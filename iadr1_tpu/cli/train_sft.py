"""PA-SFT launcher: yaml/json config + dotted CLI overrides.

Configuration surface mirrors the reference PA_SFT scripts
(scripts/train/PA_SFT/*.sh -> llamafactory yaml args: model_name_or_path,
dataset, template, cutoff_len, packing, learning rate schedule, ...), minus
the torchrun/DeepSpeed layer -- parallelism is the mesh section.

Usage:
    python -m iadr1_tpu.cli.train_sft --config configs/sft_tiny.yaml \
        train.max_steps=20 optim.learning_rate=1e-4
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np


@dataclasses.dataclass
class ModelSection:
    model_name_or_path: str = ""       # HF checkpoint dir (config+safetensors)
    hf_config: dict | None = None      # inline config -> random init (tests)
    attention: str = "auto"            # auto | flash | xla
    dtype: str = "float32"             # parameter dtype
    seed: int = 0
    # context extension (reference: --rope_scaling + --model_max_length,
    # model_utils/rope.py configure_rope): linear | dynamic | llama3
    rope_scaling: str | None = None
    model_max_length: int | None = None
    # LongLoRA shift-short attention, training only (reference:
    # --shift_attn -> configure_longlora, model_utils/longlora.py:360-366)
    shift_attn: bool = False
    # rematerialization policy for the decoder scan: "true" (save flash
    # residuals), "save_qkv" (also save the flat q/k/v projections --
    # measured +0.2pt MFU on v5e), "full", or "false"
    remat: str = "true"
    # vision-tower rematerialization (SigLIP/CLIP-tower families):
    # "default" follows `remat`; "save_acts" saves the named qkv/attn/fc1
    # acts so backward replays only the o-projection (+4.4% VLM step
    # throughput measured on v5e, tools/probe_vlm_perf.py); "full"/"false"
    tower_remat: str = "default"


@dataclasses.dataclass
class PredictSection:
    """do_predict path (reference: CustomSeq2SeqTrainer.save_predictions,
    train/sft/trainer.py:137-171): after training, greedy-generate on the
    dataset rows and write generated_predictions.jsonl with
    {"prompt", "label", "predict"} per row."""
    do_predict: bool = False
    max_samples: int = 0               # 0 = all rows
    max_new_tokens: int = 128
    temperature: float = 0.0           # 0 = greedy (predict_with_generate)
    batch_size: int = 4


@dataclasses.dataclass
class DataSection:
    dataset: str = ""                  # name in dataset_info.json, or a .json path
    dataset_info: str | None = None    # path to dataset_info.json
    image_dir: str | None = None
    template: str = "qwen2_vl"
    cutoff_len: int = 2048
    packing: bool = True
    # save/load the packed-and-tokenized rows (reference tokenized_path,
    # data/loader.py:237-300); text fields only -- multimodal extras are
    # re-derived from images and skip the cache
    tokenized_path: str | None = None
    max_samples: int | None = None
    patch_budget: int = 4096
    min_pixels: int = 56 * 56
    max_pixels: int = 480000
    # chunk of the chunked-CE LM-head scan; 4096 measured +0.5pt MFU on
    # v5e at vocab 152k (one [chunk, V] f32 block of transient HBM)
    ce_chunk: int = 1024
    # stored dtype of each [chunk, V] logits block; "bfloat16" halves its
    # HBM materialization traffic (measured +1.2pt MFU; reductions still
    # accumulate in f32)
    ce_logits_dtype: str = "float32"


@dataclasses.dataclass
class MeshSection:
    dp: int = 1
    fsdp: int = -1
    tp: int = 1


@dataclasses.dataclass
class SFTJobConfig:
    # "pt" = continued pretraining: raw text, every token labeled, packed
    # (reference stage dispatch tuner.py run_pt -> pretrain processor)
    stage: str = "sft"                 # sft | pt
    model: ModelSection = dataclasses.field(default_factory=ModelSection)
    data: DataSection = dataclasses.field(default_factory=DataSection)
    mesh: MeshSection = dataclasses.field(default_factory=MeshSection)
    optim: dict = dataclasses.field(default_factory=dict)
    train: dict = dataclasses.field(default_factory=dict)
    predict: PredictSection = dataclasses.field(default_factory=PredictSection)


def run_predict(bundle, params, tokenizer, template, data_cfg: DataSection,
                pred_cfg: PredictSection, output_dir: str) -> str:
    """Generate on the dataset prompts and write generated_predictions.jsonl
    ({"prompt", "label", "predict"} per row -- the reference's
    save_predictions schema, train/sft/trainer.py:137-171)."""
    from iadr1_tpu.data.aligner import align_rows
    from iadr1_tpu.data.registry import (
        DatasetAttr,
        load_dataset_registry,
        load_json_dataset,
    )
    from iadr1_tpu.eval.generator import GeneratorConfig, VLMGenerator

    if data_cfg.dataset.endswith((".json", ".jsonl")):
        attr = DatasetAttr(
            name="inline", file_name=data_cfg.dataset, formatting="sharegpt",
            messages="messages", images="images",
            role_tag="role", content_tag="content",
            user_tag="user", assistant_tag="assistant",
        )
    else:
        attr = load_dataset_registry(data_cfg.dataset_info)[data_cfg.dataset]
    records = align_rows(load_json_dataset(attr), attr, data_cfg.image_dir)
    if pred_cfg.max_samples:
        records = records[: pred_cfg.max_samples]

    gen = VLMGenerator(
        bundle, params, tokenizer, template,
        GeneratorConfig(
            max_prompt_length=data_cfg.cutoff_len,
            max_new_tokens=pred_cfg.max_new_tokens,
            temperature=pred_cfg.temperature,
            batch_size=pred_cfg.batch_size,
            min_pixels=data_cfg.min_pixels, max_pixels=data_cfg.max_pixels,
        ),
    )
    requests, prompts, labels = [], [], []
    for rec in records:
        msgs = rec["messages"]
        label = msgs[-1]["content"] if msgs[-1]["role"] == "assistant" else ""
        prompt_msgs = msgs[:-1] if label else msgs
        requests.append({"messages": prompt_msgs, "images": rec["images"]})
        prompts.append(
            template.render_conversation(prompt_msgs,
                                         add_generation_prompt=True))
        labels.append(label)
    preds = gen.generate(requests)
    path = os.path.join(output_dir, "generated_predictions.jsonl")
    os.makedirs(output_dir, exist_ok=True)
    with open(path, "w") as f:
        for prompt, label, predict in zip(prompts, labels, preds):
            f.write(json.dumps(
                {"prompt": prompt, "label": label, "predict": predict},
                ensure_ascii=False) + "\n")
    # predict_results.json: ROUGE/BLEU similarity scores (the reference's
    # ComputeSimilarity metrics logged by CustomSeq2SeqTrainer.predict)
    from iadr1_tpu.train.metrics_text import similarity_scores

    scores = similarity_scores(preds, labels)
    with open(os.path.join(output_dir, "predict_results.json"), "w") as f:
        json.dump({f"predict_{k}": v for k, v in scores.items()}, f, indent=1)
    print(f"predictions saved to {path}; similarity: "
          + ", ".join(f"{k}={v:.2f}" for k, v in scores.items()))
    return path


def load_tokenizer(path: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(path)


def prepare_rows(cfg: DataSection, tokenizer, template, bundle,
                 stage: str = "sft"):
    """registry/json -> aligned -> (mm expand) -> encoded -> packed rows.

    stage "pt": raw-text language modeling -- message contents are
    concatenated, every token (plus EOS) is labeled, no template/masking
    (reference data/processors/pretrain.py)."""
    from iadr1_tpu.data.aligner import align_rows
    from iadr1_tpu.data.mm import expand_image_tokens
    from iadr1_tpu.data.packing import pack_examples
    from iadr1_tpu.data.registry import (
        DatasetAttr,
        load_dataset_registry,
        load_json_dataset,
    )
    from iadr1_tpu.data.tokenize import encode_supervised_example

    if cfg.dataset.endswith(".json") or cfg.dataset.endswith(".jsonl"):
        attr = DatasetAttr(
            name="inline", file_name=cfg.dataset, formatting="sharegpt",
            messages="messages", images="images",
            role_tag="role", content_tag="content",
            user_tag="user", assistant_tag="assistant",
        )
    else:
        registry = load_dataset_registry(cfg.dataset_info)
        attr = registry[cfg.dataset]
    rows = load_json_dataset(attr)
    if cfg.max_samples:
        rows = rows[: cfg.max_samples]

    pad_id = tokenizer.pad_token_id
    if pad_id is None:
        pad_id = tokenizer.eos_token_id

    if stage == "pt":
        # raw-text LM: read text straight off the rows (a "text" column or
        # concatenated message contents) -- the conversation aligner would
        # drop response-less rows
        encoded = []
        for row in rows:
            if "text" in row:
                text = row["text"]
            else:
                msgs = row.get(attr.messages or "messages",
                               row.get("messages", []))
                text = "\n".join(
                    m.get(attr.content_tag or "content", m.get("content", ""))
                    for m in msgs
                )
            ids = tokenizer.encode(text, add_special_tokens=False)
            ids = ids[: cfg.cutoff_len - 2] + [tokenizer.eos_token_id]
            encoded.append({"input_ids": ids, "labels": list(ids)})
        return pack_examples(encoded, cfg.cutoff_len, pad_id)

    records = align_rows(rows, attr, cfg.image_dir)

    encoded = []
    for rec in records:
        messages = rec["messages"]
        extras = {}
        if bundle.multimodal and rec["images"]:
            from PIL import Image

            patches, grids, seqlens = [], [], []
            for img in rec["images"]:
                pil = Image.open(img) if isinstance(img, str) else img
                flat, grid, seqlen = bundle.preprocess_image(
                    pil, min_pixels=cfg.min_pixels, max_pixels=cfg.max_pixels
                )
                patches.append(flat)
                grids.append(grid)
                seqlens.append(seqlen)
            messages = expand_image_tokens(
                messages, seqlens, template.mm_style, template.image_token
            )
            extras = {"patches": patches, "grid_thw": grids}
        elif rec["images"]:
            # text model given image data: strip placeholders
            messages = [
                {**m, "content": m["content"].replace("<image>", "")}
                for m in messages
            ]
        cut = cfg.cutoff_len - 1
        if extras and template.mm_style == "paligemma":
            # the image-token run is prepended AFTER encoding, so it must
            # be budgeted out of the text cutoff or packing drops the row
            cut = max(cut - sum(seqlens), 8)
        input_ids, labels = encode_supervised_example(
            messages, template, tokenizer,
            system=rec.get("system"), cutoff_len=cut,
        )
        if extras and template.mm_style == "paligemma":
            from iadr1_tpu.data.mm import prepend_image_tokens

            input_ids, labels = prepend_image_tokens(
                input_ids, labels, seqlens, bundle.cfg.image_token_id
            )
        ex = {"input_ids": input_ids, "labels": labels}
        if extras:
            ex["extras"] = extras
        encoded.append(ex)

    return pack_examples(encoded, cfg.cutoff_len, pad_id)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from iadr1_tpu.core.config import load_config
    from iadr1_tpu.core import MeshConfig, build_mesh
    from iadr1_tpu.core.mesh import pytree_shardings
    from iadr1_tpu.core.metrics import ThroughputMeter, transformer_flops_per_token
    from iadr1_tpu.data.collator import VLMBatchBuilder, text_batch
    from iadr1_tpu.data.template import get_template
    from iadr1_tpu.models.registry import bundle_from_hf_config, bundle_from_pretrained
    from iadr1_tpu.models.params_io import load_safetensors_path
    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.checkpoint import CheckpointManager
    from iadr1_tpu.train.loop import LoopConfig, batch_iterator, run_sft_loop
    from iadr1_tpu.train.state import create_sharded_state
    from iadr1_tpu.core.config import dataclass_from_dict

    import jax
    import jax.numpy as jnp

    from iadr1_tpu.core.distributed import maybe_initialize_distributed

    # multi-host pods: wire processes together before any device use
    maybe_initialize_distributed()

    cfg = load_config(SFTJobConfig, args.config, args.overrides)
    loop_cfg = dataclass_from_dict(LoopConfig, cfg.train)
    opt_cfg = dataclass_from_dict(OptimizerConfig, cfg.optim)

    dtype = getattr(jnp, cfg.model.dtype)
    if cfg.model.hf_config:
        hf_cfg_dict = cfg.model.hf_config
    else:
        with open(os.path.join(cfg.model.model_name_or_path,
                               "config.json")) as f:
            hf_cfg_dict = json.load(f)
    if cfg.model.rope_scaling:
        from iadr1_tpu.models.registry import configure_rope_scaling

        hf_cfg_dict = configure_rope_scaling(
            hf_cfg_dict, cfg.model.rope_scaling, cfg.model.model_max_length
        )
    attention = cfg.model.attention
    if cfg.model.shift_attn and not attention.startswith("longlora"):
        # training-only shift-short attention wrapping the selected impl
        attention = ("longlora" if attention == "auto"
                     else f"longlora_{attention}")
    bundle = bundle_from_hf_config(hf_cfg_dict, attention=attention)
    if cfg.model.hf_config:
        params = bundle.init_params(jax.random.PRNGKey(cfg.model.seed), dtype=dtype)
    else:
        state_dict = load_safetensors_path(cfg.model.model_name_or_path)
        params = bundle.convert_hf(state_dict, dtype=dtype)

    tokenizer = load_tokenizer(cfg.model.model_name_or_path)
    template = get_template(cfg.data.template)

    from iadr1_tpu.data.cache import load_tokenized, save_tokenized

    rows = None
    if cfg.data.tokenized_path:
        rows = load_tokenized(cfg.data.tokenized_path)
        if rows is not None:
            print(f"loaded {len(rows)} tokenized rows from "
                  f"{cfg.data.tokenized_path}")
    if rows is None:
        rows = prepare_rows(cfg.data, tokenizer, template, bundle,
                            stage=cfg.stage)
        if cfg.data.tokenized_path:
            if save_tokenized(cfg.data.tokenized_path, rows):
                print(f"tokenized dataset saved to {cfg.data.tokenized_path}")
    print(f"packed {len(rows)} rows of length {cfg.data.cutoff_len}")

    mesh = build_mesh(MeshConfig(cfg.mesh.dp, cfg.mesh.fsdp, cfg.mesh.tp))
    params = jax.device_put(params, pytree_shardings(bundle.logical_axes(), mesh))
    if not opt_cfg.total_steps:
        opt_cfg = dataclasses.replace(opt_cfg, total_steps=loop_cfg.max_steps)
    optimizer, schedule = make_optimizer(opt_cfg)
    state = create_sharded_state(params, optimizer)
    # chunked CE: never materializes [B,T,V] logits (the batch-size limiter
    # at vocab 152k); MoE bundles add the router load-balancing aux loss
    # (reference model_utils/moe.py output_router_logits wiring)
    from iadr1_tpu.train.sft import make_chunked_sft_step

    aux_coef = (bundle.cfg.router_aux_loss_coef
                if bundle.family == "qwen2_moe" else 0.0)
    remat_mode = {"true": True, "false": False}.get(
        cfg.model.remat, cfg.model.remat)
    tower_kw = {}
    if cfg.model.tower_remat != "default":
        tower_kw["tower_remat"] = {"true": True, "false": False}.get(
            cfg.model.tower_remat, cfg.model.tower_remat)
        import inspect

        if "tower_remat" not in inspect.signature(
                bundle.apply).parameters:
            raise ValueError(
                f"model.tower_remat={cfg.model.tower_remat!r} set but the "
                f"{bundle.family} family has no vision-tower remat knob")
    if aux_coef:
        def hidden_fn(params, batch):
            h, _cache, aux = bundle.apply(params, batch, remat=remat_mode,
                                          return_aux=True)
            return h, aux
    else:
        def hidden_fn(params, batch):
            return bundle.hidden_fn(params, batch, remat=remat_mode,
                                    **tower_kw)
    step = make_chunked_sft_step(
        hidden_fn, bundle.head_kernel_fn, optimizer, schedule,
        chunk_size=cfg.data.ce_chunk, aux_loss_coef=aux_coef,
        logits_dtype=getattr(jnp, cfg.data.ce_logits_dtype),
    )

    ckpt = CheckpointManager(
        os.path.join(loop_cfg.output_dir, "checkpoints"),
        max_to_keep=loop_cfg.keep_checkpoints,
    )
    start_step = 0
    if loop_cfg.resume:
        latest = ckpt.latest_step()
        if latest is not None:
            state = ckpt.restore(state)
            start_step = latest
            print(f"resumed from checkpoint step {latest}")

    has_vision = any(r.get("extras") for r in rows)
    if bundle.multimodal and has_vision:
        collate = VLMBatchBuilder(
            bundle=bundle,
            patch_budget=cfg.data.patch_budget,
            min_pixels=cfg.data.min_pixels,
            max_pixels=cfg.data.max_pixels,
        )
    else:
        # text-only data through a VLM checkpoint (e.g. the pt stage):
        # skip the vision tower entirely -- M-RoPE broadcasts the 1-D
        # positions, and apply() skips the tower when patches are absent
        collate = text_batch
    batches = batch_iterator(rows, loop_cfg.batch_size, loop_cfg.seed, collate,
                             skip=start_step)
    # explicit batch shardings: token arrays over (dp, fsdp), vision aux
    # replicated -- consecutive programs otherwise get incompatible
    # auto-sharding guesses (SPMD involuntary full rematerialization)
    from iadr1_tpu.core.mesh import shard_batch

    batches = (shard_batch(mesh, b) for b in batches)

    tcfg = getattr(bundle.cfg, "text", bundle.cfg)
    meter = ThroughputMeter(
        flops_per_token_fwd=transformer_flops_per_token(
            hidden=tcfg.hidden_size, intermediate=tcfg.intermediate_size,
            num_layers=tcfg.num_hidden_layers, vocab=tcfg.vocab_size,
            seq_len=cfg.data.cutoff_len,
            num_heads=tcfg.num_attention_heads,
            num_kv_heads=tcfg.num_key_value_heads,
        ),
        n_chips=mesh.size,
        chip="v5e" if jax.default_backend() == "tpu" else "cpu",
    )
    state, history = run_sft_loop(state, step, batches, loop_cfg, ckpt, meter,
                                  start_step=start_step)
    print(json.dumps({"final": history[-1] if history else {}}))
    if cfg.predict.do_predict:
        run_predict(bundle, state.params, tokenizer, template, cfg.data,
                    cfg.predict, loop_cfg.output_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
