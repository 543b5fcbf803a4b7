"""SC-GRPO launcher.

Mirrors the reference RL entry point (train/stage_rl/grpo_ad.py +
scripts/train/SC_GRPO/*.sh): a json dataset of {image, problem, solution}
rows, the 0-shot/1-shot IAD prompt templates, a reward-function list
(default accuracy + format), G-way rollouts, and the SC-GRPO update -- all
on one mesh with no vLLM sidecar.

Usage:
    python -m iadr1_tpu.cli.train_grpo --config configs/grpo_tiny.yaml \
        grpo.num_generations=4 train.max_steps=100
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np


@dataclasses.dataclass
class GRPOModelSection:
    model_name_or_path: str = ""
    hf_config: dict | None = None
    attention: str = "auto"
    dtype: str = "float32"
    ref_dtype: str = "bfloat16"       # frozen reference copy precision
    seed: int = 0
    # QLoRA-class quantized base (reference model_utils/quantization.py +
    # adapter.py: bnb 4-bit base + LoRA).  Requires finetuning_type=lora;
    # the quantized base is replicated over the mesh (int4 makes the
    # replica affordable -- 7B base = ~3.6 GB/chip) and the KL reference
    # is the same quantized base (ref elision), so one weight copy total.
    quant: str = "none"               # none | int8 | int4 | nf4
    quant_block: int = 64             # blockwise scale granularity (int4/nf4)


@dataclasses.dataclass
class GRPODataSection:
    dataset_name: str = ""            # RL json: [{image, problem, solution}]
    image_path: str | None = None
    use_system_prompt: bool = False
    single_img: int = 1
    template: str = "qwen2_vl"
    max_samples: int | None = None
    patch_budget: int = 4096
    min_pixels: int = 3136            # grpo_ad.py defaults (:54-60)
    max_pixels: int = 480000          # SC_GRPO script override


@dataclasses.dataclass
class GRPOSection:
    num_generations: int = 4
    beta: float = 0.04
    temperature: float = 0.9
    top_p: float = 0.9
    top_k: int = 50
    max_prompt_length: int = 1024
    max_completion_length: int = 512
    # TPU-accelerated approximate top-k sampling during rollout
    # (jax.lax.approx_max_k, ~0.95 recall; measured +5% decode on v5e)
    approx_top_k: bool = False
    # sync_ref_model knobs (trl TR-DPO-style periodic ref refresh)
    sync_ref_model: bool = False
    ref_model_mixup_alpha: float = 0.6
    ref_model_sync_steps: int = 512
    reward_funcs: list = dataclasses.field(
        default_factory=lambda: ["accuracy", "format"]
    )


@dataclasses.dataclass
class GRPOTuningSection:
    # "lora" trains factored adapters over a frozen bf16 base and elides
    # the reference model (the base IS the KL reference -- trl
    # PEFT-ref-None path): one weight copy total, the memory mode for 7B
    finetuning_type: str = "full"     # full | lora
    lora_rank: int = 8
    lora_alpha: float = 16.0
    use_dora: bool = False            # weight-decomposed LoRA magnitudes
    use_rslora: bool = False          # alpha/sqrt(r) scaling
    pissa_init: bool = False          # principal-SVD adapter init


@dataclasses.dataclass
class GRPOJobConfig:
    model: GRPOModelSection = dataclasses.field(default_factory=GRPOModelSection)
    data: GRPODataSection = dataclasses.field(default_factory=GRPODataSection)
    grpo: GRPOSection = dataclasses.field(default_factory=GRPOSection)
    finetuning: GRPOTuningSection = dataclasses.field(
        default_factory=GRPOTuningSection)
    mesh: dict = dataclasses.field(default_factory=dict)
    optim: dict = dataclasses.field(default_factory=dict)
    train: dict = dataclasses.field(default_factory=dict)


def make_vlm_prompt_collator(bundle, tokenizer, template, cfg: GRPODataSection,
                             max_prompt_length: int, num_generations: int = 1):
    """(examples, G) -> rollout batch with vision arrays + M-RoPE grids.

    Each example carries pre-encoded prompt_ids plus preprocessed patches
    and grid_thw; prompts repeat G times consecutively.
    ``cfg.patch_budget`` sizes the G=num_generations (update) collation;
    the G=1 rollout collation scales it down by the group factor so the
    prefix-cached prefill's vision tower does not process a G-times
    padded patch stream.
    """
    import jax.numpy as jnp

    from iadr1_tpu.vision.mrope import get_mrope_positions

    pad = tokenizer.pad_token_id or tokenizer.eos_token_id

    def collate(examples, G):
        P = max_prompt_length
        budget = max(cfg.patch_budget * G // max(num_generations, 1), 8)
        rows = [ex for ex in examples for _ in range(G)]
        B = len(rows)
        input_ids = np.full((B, P), pad, np.int64)
        mask = np.zeros((B, P), np.int64)
        patches_list, grids, videos_list = [], [], []
        img_id = getattr(bundle.cfg, "image_token_id", None)
        for i, ex in enumerate(rows):
            ids = ex["prompt_ids"][-P:]
            if len(ex["prompt_ids"]) > P and img_id is not None and (
                img_id in ex["prompt_ids"]
            ):
                # truncation through an image-token run would desync the
                # feature scatter indices (VLM prompts must fit whole)
                raise ValueError(
                    f"VLM prompt ({len(ex['prompt_ids'])} tokens) exceeds "
                    f"max_prompt_length={P}; raise max_prompt_length or "
                    "lower max_pixels"
                )
            input_ids[i, P - len(ids):] = ids
            mask[i, P - len(ids):] = 1
            patches_list.extend(ex.get("patches", []))
            grids.extend(ex.get("grid_thw", []))
            videos_list.extend(ex.get("video_patches", []))
        batch = {
            "input_ids": jnp.asarray(input_ids, jnp.int32),
            "attention_mask": jnp.asarray(mask, jnp.int32),
        }
        tcfg = getattr(bundle.cfg, "text", bundle.cfg)
        if tcfg.mrope_section is not None:
            grid_thw = np.asarray(grids, np.int64).reshape(-1, 3)
            pos, deltas = get_mrope_positions(
                input_ids, grid_thw if len(grids) else None,
                bundle.cfg.image_token_id, bundle.cfg.vision_start_token_id,
                attention_mask=mask,
            )
            batch["position_ids"] = jnp.asarray(pos, jnp.int32)
            batch["mrope_deltas"] = jnp.asarray(deltas, jnp.int32)
        arrays = bundle.vision_arrays(
            input_ids, patches_list, grids, budget,
            **({"videos": videos_list} if videos_list else {})
        )
        batch.update({k: jnp.asarray(v) for k, v in arrays.items()})
        return batch

    return collate


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from iadr1_tpu.core import MeshConfig, build_mesh
    from iadr1_tpu.core.config import dataclass_from_dict, load_config
    from iadr1_tpu.core.mesh import pytree_shardings
    from iadr1_tpu.data.mm import expand_image_tokens
    from iadr1_tpu.data.template import get_template
    from iadr1_tpu.models.params_io import load_safetensors_path
    from iadr1_tpu.models.registry import bundle_from_hf_config, bundle_from_pretrained
    from iadr1_tpu.rewards import get_reward_funcs
    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.checkpoint import CheckpointManager
    from iadr1_tpu.train.grpo import GRPOConfig, GRPOTrainer
    from iadr1_tpu.train.loop import JsonlLogger, LoopConfig
    from iadr1_tpu.train.prompts import make_conversation
    from iadr1_tpu.train.state import create_sharded_state

    from iadr1_tpu.core.distributed import maybe_initialize_distributed

    # multi-host pods: wire processes together before any device use
    maybe_initialize_distributed()

    cfg = load_config(GRPOJobConfig, args.config, args.overrides)
    loop_cfg = dataclass_from_dict(LoopConfig, cfg.train)
    opt_cfg = dataclass_from_dict(OptimizerConfig, cfg.optim)
    grpo_cfg = GRPOConfig(
        num_generations=cfg.grpo.num_generations, beta=cfg.grpo.beta,
        temperature=cfg.grpo.temperature, top_p=cfg.grpo.top_p,
        top_k=cfg.grpo.top_k, max_prompt_length=cfg.grpo.max_prompt_length,
        max_completion_length=cfg.grpo.max_completion_length,
        sync_ref_model=cfg.grpo.sync_ref_model,
        ref_model_mixup_alpha=cfg.grpo.ref_model_mixup_alpha,
        ref_model_sync_steps=cfg.grpo.ref_model_sync_steps,
    )
    sampling_overrides = (
        {"approx_top_k": True} if cfg.grpo.approx_top_k else None
    )

    dtype = getattr(jnp, cfg.model.dtype)
    if cfg.model.hf_config:
        bundle = bundle_from_hf_config(cfg.model.hf_config,
                                       attention=cfg.model.attention)
        params = bundle.init_params(jax.random.PRNGKey(cfg.model.seed), dtype=dtype)
    else:
        bundle = bundle_from_pretrained(cfg.model.model_name_or_path,
                                        attention=cfg.model.attention)
        params = bundle.convert_hf(
            load_safetensors_path(cfg.model.model_name_or_path), dtype=dtype
        )
    tokenizer = AutoTokenizer.from_pretrained(cfg.model.model_name_or_path)
    template = get_template(cfg.data.template)

    # dataset: RL json rows -> conversations -> encoded prompts (+ vision)
    with open(cfg.data.dataset_name) as f:
        raw = json.load(f)
    if cfg.data.max_samples:
        raw = raw[: cfg.data.max_samples]
    examples = []
    for row in raw:
        conv = make_conversation(
            row, image_path=cfg.data.image_path,
            use_system_prompt=cfg.data.use_system_prompt,
            single_img=cfg.data.single_img,
        )
        ex = {"solution": conv["solution"]}
        messages = conv["messages"]
        if bundle.multimodal and conv["images"]:
            from PIL import Image

            patches, grids, seqlens = [], [], []
            for img in conv["images"]:
                pil = Image.open(img) if isinstance(img, str) else img
                flat, grid, seqlen = bundle.preprocess_image(
                    pil, min_pixels=cfg.data.min_pixels,
                    max_pixels=cfg.data.max_pixels,
                )
                patches.append(flat)
                grids.append(grid)
                seqlens.append(seqlen)
            messages = expand_image_tokens(
                messages, seqlens, template.mm_style, template.image_token
            )
            ex.update(patches=patches, grid_thw=grids)
        ex["prompt_ids"] = template.encode_prompt(
            tokenizer, messages, system=conv["system"]
        )
        if bundle.multimodal and conv["images"] and (
            template.mm_style == "paligemma"
        ):
            from iadr1_tpu.data.mm import prepend_image_tokens

            ex["prompt_ids"], _ = prepend_image_tokens(
                ex["prompt_ids"], None, seqlens, bundle.cfg.image_token_id
            )
        examples.append(ex)
    print(f"prepared {len(examples)} RL prompts")

    mesh = build_mesh(dataclass_from_dict(MeshConfig, cfg.mesh))
    if cfg.model.quant != "none":
        if cfg.finetuning.finetuning_type != "lora":
            raise ValueError(
                "model.quant requires finetuning.finetuning_type=lora "
                "(integer base weights cannot take optimizer updates)")
        if cfg.finetuning.pissa_init:
            raise ValueError(
                "model.quant is incompatible with finetuning.pissa_init: "
                "PiSSA needs a full-precision SVD of the base kernels, "
                "but quantize_tree has replaced them with packed quant "
                "dicts -- disable one of the two")
        from jax.sharding import NamedSharding, PartitionSpec

        if cfg.model.quant in ("gptq", "awq"):
            # pre-quantized hub checkpoint: the packed tensors were
            # rewritten into quant dicts at load time
            # (params_io.convert_prequantized_state) -- nothing to
            # quantize here, just verify the checkpoint really was one
            from iadr1_tpu.models.quant import is_quantized

            if not any(is_quantized(l) for l in jax.tree.leaves(
                    params, is_leaf=is_quantized)):
                raise ValueError(
                    f"model.quant={cfg.model.quant!r} but the checkpoint "
                    "has no packed qweight tensors -- point "
                    "model_name_or_path at a GPTQ/AWQ export or use "
                    "int4/nf4/int8 to quantize a bf16 checkpoint")
        else:
            from iadr1_tpu.models.quant import quantize_tree

            params = quantize_tree(params, fmt=cfg.model.quant,
                                   block_size=cfg.model.quant_block)
        # the quantized base replicates (its whole point is that the
        # replica is small); adapters/optimizer still shard below
        rep = NamedSharding(mesh, PartitionSpec())
        params = jax.tree.map(lambda x: jax.device_put(x, rep), params)
    else:
        shardings = pytree_shardings(bundle.logical_axes(), mesh)
        params = jax.device_put(params, shardings)

    if not opt_cfg.total_steps:
        opt_cfg = dataclasses.replace(opt_cfg, total_steps=loop_cfg.max_steps)
    optimizer, schedule = make_optimizer(opt_cfg)

    collator = (
        make_vlm_prompt_collator(bundle, tokenizer, template, cfg.data,
                                 grpo_cfg.max_prompt_length,
                                 num_generations=grpo_cfg.num_generations)
        if bundle.multimodal else None
    )
    if cfg.finetuning.finetuning_type == "lora":
        from iadr1_tpu.train.adapters import TuningConfig, init_lora_params

        tuning_cfg = TuningConfig(
            finetuning_type="lora", lora_rank=cfg.finetuning.lora_rank,
            lora_alpha=cfg.finetuning.lora_alpha,
            use_dora=cfg.finetuning.use_dora,
            use_rslora=cfg.finetuning.use_rslora,
        )
        if cfg.finetuning.pissa_init:
            from iadr1_tpu.train.adapters import pissa_init as _pissa

            lora, params = _pissa(params, tuning_cfg)
        else:
            lora = init_lora_params(
                jax.random.PRNGKey(cfg.model.seed + 1), params, tuning_cfg
            )
        state = create_sharded_state(lora, optimizer)
        trainer = GRPOTrainer(
            bundle, tokenizer, optimizer, grpo_cfg,
            get_reward_funcs(cfg.grpo.reward_funcs), state, None,
            sampling_overrides=sampling_overrides,
            schedule=schedule, template=template, prompt_collator=collator,
            base_params=params, tuning_cfg=tuning_cfg,
        )
    else:
        ref_dtype = getattr(jnp, cfg.model.ref_dtype)
        ref_params = jax.tree.map(lambda x: x.astype(ref_dtype), params)
        state = create_sharded_state(params, optimizer)
        trainer = GRPOTrainer(
            bundle, tokenizer, optimizer, grpo_cfg,
            get_reward_funcs(cfg.grpo.reward_funcs), state, ref_params,
            sampling_overrides=sampling_overrides,
            schedule=schedule, template=template, prompt_collator=collator,
        )

    logger = JsonlLogger(loop_cfg.output_dir, loop_cfg.max_steps)
    ckpt = CheckpointManager(
        os.path.join(loop_cfg.output_dir, "checkpoints"),
        max_to_keep=loop_cfg.keep_checkpoints,
    )
    start_step = 0
    if loop_cfg.resume:
        latest = ckpt.latest_step()
        if latest is not None:
            trainer.state = ckpt.restore(trainer.state)
            trainer.fast_forward_rng(latest)
            start_step = latest
            print(f"resumed from checkpoint step {latest}")
    rng = np.random.default_rng(loop_cfg.seed)
    per_step = max(loop_cfg.batch_size, 1)
    for step_idx in range(1, loop_cfg.max_steps + 1):
        # the prompt-sampling stream is drawn every step so a resumed run
        # sees the same example sequence as an uninterrupted one
        idx = rng.choice(len(examples), size=per_step, replace=False)
        if step_idx <= start_step:
            continue
        metrics = trainer.step([examples[i] for i in idx])
        if step_idx % max(loop_cfg.logging_steps, 1) == 0:
            logger.log(step_idx, metrics)
        if loop_cfg.save_steps and step_idx % loop_cfg.save_steps == 0:
            ckpt.save(step_idx, trainer.state)
    ckpt.save(loop_cfg.max_steps, trainer.state)
    ckpt.wait()
    logger.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
