"""Full IAD-R1 recipe in ONE command: PA-SFT -> SC-GRPO -> benchmark eval.

The reference runs its recipe as three hand-chained launches -- PA-SFT
(train/stage_sft/train.py:15-28, llamafactory yaml), SC-GRPO warm-started
from the SFT output (train/stage_rl/grpo_ad.py:67-207, whose
model_name_or_path points at the stage-1 export), then one vLLM driver per
benchmark (scripts/Inference/IAD-R1-Inference/vLLM_Qwen_detect_format.py:
253-381) and the accuracy summarizer (helper/summary.py).  The checkpoint
handoff between stages and the template consistency between train and eval
live in shell scripts there; here they are one config:

    python -m iadr1_tpu.cli.pipeline --config configs/pipeline.yaml

Stage artifacts (all under ``output_dir``):

    sft/            trainer_log.jsonl + orbax checkpoints
    sft_export/     HF-format export (config/tokenizer copied from base)
    grpo/           trainer_log.jsonl + orbax checkpoints
    grpo_export/    HF-format export (LoRA merged if finetuning_type=lora)
    results/<name>/answers_{k}_shot.json + *_accuracy.csv  per benchmark
    results/summary_{k}_shot.csv   all benchmarks, rows = datasets+Average
                                   (the supplementary_results CSV layout)

``stages`` selects a subset (default all three); a later stage picks up an
earlier stage's export from disk, so ``stages: [eval]`` re-runs eval alone
against an existing ``grpo_export``.
"""

from __future__ import annotations

import argparse
import copy
import dataclasses
import json
import os


@dataclasses.dataclass
class BenchmarkSpec:
    test_data: str                     # test_*_format.json
    image_dir: str = ""
    name: str = ""                     # default: parsed from the filename
    normal_flag: str = "good"
    max_samples: int | None = None


@dataclasses.dataclass
class PipelineEvalSection:
    # list of benchmark dicts (BenchmarkSpec fields); the reference recipe
    # evaluates six sets (MVTec, VisA, MPDD, DAGM, DTD, SDD)
    benchmarks: list = dataclasses.field(default_factory=list)
    num_shot: int = 0
    batch_size: int = 4
    max_prompt_length: int = 1024
    max_new_tokens: int = 512
    patch_budget: int = 4096
    max_pixels: int = 480000
    template: str | None = None
    attention: str = "auto"
    mode: str = "iad"                  # iad | pretrain (base-ckpt variant)


@dataclasses.dataclass
class PipelineConfig:
    model_name_or_path: str = ""       # stage-0 base checkpoint
    output_dir: str = "output/pipeline"
    stages: list = dataclasses.field(
        default_factory=lambda: ["sft", "grpo", "eval"])
    sft: dict = dataclasses.field(default_factory=dict)    # SFTJobConfig
    grpo: dict = dataclasses.field(default_factory=dict)   # GRPOJobConfig
    eval: PipelineEvalSection = dataclasses.field(
        default_factory=PipelineEvalSection)


def _bench_name(spec: BenchmarkSpec) -> str:
    if spec.name:
        return spec.name
    base = os.path.basename(spec.test_data)
    # test_DAGM_format.json -> DAGM (the reference's results-dir naming,
    # supplementary_results/*/test_DAGM/)
    if base.startswith("test_") and base.endswith("_format.json"):
        return base[len("test_"):-len("_format.json")]
    return os.path.splitext(base)[0]


def export_run(base_model_path: str, checkpoint_dir: str, out_dir: str,
               finetuning: dict | None = None, step: int | None = None,
               quant: str = "none", quant_block: int = 64) -> str:
    """Orbax run checkpoint -> HF-format dir the next stage can load.

    ``finetuning`` (the GRPO CLI's finetuning section) switches the state
    template to the LoRA adapter pytree and merges the adapters into the
    base kernels on export (reference: export_model merges PEFT adapters,
    train/tuner.py:95-173).

    ``quant`` must match the training run's ``model.quant``: QLoRA adapters
    were tuned against the *dequantized quantized* base, so the export
    quantizes the loaded base the same way before merging (peft
    merge_and_unload on a bnb base has the same semantics) -- merging into
    the full-precision base would silently ship a model that differs from
    the one trained and evaluated."""
    import jax
    import jax.numpy as jnp

    from iadr1_tpu.models.params_export import save_pretrained
    from iadr1_tpu.models.params_io import load_safetensors_path
    from iadr1_tpu.models.registry import bundle_from_pretrained
    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.checkpoint import CheckpointManager
    from iadr1_tpu.train.state import create_train_state

    bundle = bundle_from_pretrained(base_model_path, attention="xla")
    params = bundle.convert_hf(load_safetensors_path(base_model_path))
    if quant != "none":
        if not (finetuning
                and finetuning.get("finetuning_type") == "lora"):
            raise ValueError(
                "quantized export requires a LoRA finetuning section "
                "(a quantized base cannot have taken full updates)")
        from iadr1_tpu.models.quant import quantize_tree

        params = quantize_tree(params, fmt=quant, block_size=quant_block)
    optimizer, _ = make_optimizer(OptimizerConfig())

    tuning_cfg = None
    if finetuning and finetuning.get("finetuning_type") == "lora":
        from iadr1_tpu.train.adapters import TuningConfig, init_lora_params

        if finetuning.get("pissa_init"):
            raise ValueError(
                "pipeline export of pissa_init runs is unsupported: PiSSA "
                "rewrites the base weights at adapter init, so the base "
                "checkpoint alone cannot reconstruct the merged model"
            )
        tuning_cfg = TuningConfig(
            finetuning_type="lora",
            lora_rank=finetuning.get("lora_rank", 8),
            lora_alpha=finetuning.get("lora_alpha", 16.0),
            use_dora=finetuning.get("use_dora", False),
            use_rslora=finetuning.get("use_rslora", False),
        )
        template = init_lora_params(jax.random.PRNGKey(0), params, tuning_cfg)
    else:
        template = params

    state_like = jax.eval_shape(
        lambda p: create_train_state(p, optimizer), template)
    state_like = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), state_like)
    state = CheckpointManager(checkpoint_dir).restore(state_like, step=step)

    if tuning_cfg is not None:
        from iadr1_tpu.train.adapters import merge_lora

        out_params = merge_lora(params, state.params, tuning_cfg)
        if quant != "none":
            # leaves the LoRA did not target may still be quant dicts;
            # the exported HF checkpoint needs dense kernels everywhere
            from iadr1_tpu.models.quant import dequantize_tree

            out_params = dequantize_tree(out_params, jnp.bfloat16)
    else:
        out_params = state.params
    save_pretrained(bundle, out_params, out_dir, source_dir=base_model_path)
    return out_dir


def run_pipeline(cfg: PipelineConfig) -> dict:
    """Execute the selected stages; returns artifact paths."""
    out = cfg.output_dir
    os.makedirs(out, exist_ok=True)
    sft_dir = os.path.join(out, "sft")
    sft_export = os.path.join(out, "sft_export")
    grpo_dir = os.path.join(out, "grpo")
    grpo_export = os.path.join(out, "grpo_export")
    results_dir = os.path.join(out, "results")
    artifacts = {"output_dir": out}

    if "sft" in cfg.stages:
        from iadr1_tpu.cli.train_sft import main as sft_main

        stage_cfg = copy.deepcopy(cfg.sft)
        stage_cfg.setdefault("model", {}).setdefault(
            "model_name_or_path", cfg.model_name_or_path)
        stage_cfg.setdefault("train", {})["output_dir"] = sft_dir
        cfg_path = os.path.join(out, "sft_config.json")
        with open(cfg_path, "w") as f:
            json.dump(stage_cfg, f, indent=1)
        rc = sft_main(["--config", cfg_path])
        if rc:
            raise RuntimeError(f"sft stage failed (rc={rc})")
        export_run(stage_cfg["model"]["model_name_or_path"],
                   os.path.join(sft_dir, "checkpoints"), sft_export)
        artifacts["sft"] = sft_dir
        artifacts["sft_export"] = sft_export

    if "grpo" in cfg.stages:
        from iadr1_tpu.cli.train_grpo import main as grpo_main

        stage_cfg = copy.deepcopy(cfg.grpo)
        # warm-start: the SC-GRPO base IS the PA-SFT export (the point of
        # the two-stage recipe -- grpo_ad.py model_name_or_path receives
        # the stage-1 output in SC_GRPO_*.sh)
        stage_cfg.setdefault("model", {}).setdefault(
            "model_name_or_path",
            sft_export if os.path.isdir(sft_export)
            else cfg.model_name_or_path)
        stage_cfg.setdefault("train", {})["output_dir"] = grpo_dir
        cfg_path = os.path.join(out, "grpo_config.json")
        with open(cfg_path, "w") as f:
            json.dump(stage_cfg, f, indent=1)
        rc = grpo_main(["--config", cfg_path])
        if rc:
            raise RuntimeError(f"grpo stage failed (rc={rc})")
        model_section = stage_cfg.get("model", {})
        export_run(stage_cfg["model"]["model_name_or_path"],
                   os.path.join(grpo_dir, "checkpoints"), grpo_export,
                   finetuning=stage_cfg.get("finetuning"),
                   quant=model_section.get("quant", "none"),
                   quant_block=model_section.get("quant_block", 64))
        artifacts["grpo"] = grpo_dir
        artifacts["grpo_export"] = grpo_export

    if "eval" in cfg.stages:
        from iadr1_tpu.cli.infer import main as infer_main
        from iadr1_tpu.eval.summary import summarize_answers

        # only consider exports this invocation produced (or, for a pure
        # ``stages: [eval]`` re-run, any export on disk) -- a [sft, eval]
        # run must not silently pick up a STALE grpo_export from an
        # earlier invocation into the same output_dir
        eval_only = list(cfg.stages) == ["eval"]
        candidates = []
        if "grpo" in cfg.stages or eval_only:
            candidates.append(grpo_export)
        if "sft" in cfg.stages or eval_only:
            candidates.append(sft_export)
        candidates.append(cfg.model_name_or_path)
        model_path = next(
            (d for d in candidates if d and os.path.isdir(d)), None)
        if model_path is None:
            raise RuntimeError("eval stage: no model export found and no "
                               "model_name_or_path configured")
        ev = cfg.eval
        shot = ev.num_shot
        all_answers: list[dict] = []
        per_bench = {}
        for spec_dict in ev.benchmarks:
            spec = BenchmarkSpec(**spec_dict)
            name = _bench_name(spec)
            bench_out = os.path.join(results_dir, name)
            argv = [
                "--model-path", model_path,
                "--test-data", spec.test_data,
                "--image-dir", spec.image_dir,
                "--output-dir", bench_out,
                "--num-shot", str(shot),
                "--batch-size", str(ev.batch_size),
                "--max-prompt-length", str(ev.max_prompt_length),
                "--max-new-tokens", str(ev.max_new_tokens),
                "--patch-budget", str(ev.patch_budget),
                "--max-pixels", str(ev.max_pixels),
                "--attention", ev.attention,
                "--normal-flag", spec.normal_flag,
                "--mode", ev.mode,
            ]
            if ev.template:
                argv += ["--template", ev.template]
            if spec.max_samples:
                argv += ["--max-samples", str(spec.max_samples)]
            rc = infer_main(argv)
            if rc:
                raise RuntimeError(f"eval stage failed on {name} (rc={rc})")
            answers_path = os.path.join(bench_out,
                                        f"answers_{shot}_shot.json")
            with open(answers_path) as f:
                answers = json.load(f)
            all_answers.extend(answers)
            per_bench[name] = answers_path

        # combined table: one row per dataset + Average, question types as
        # columns -- the layout of the reference's per-model result CSVs
        # (record `image` keys carry the dataset as their first component)
        summary = summarize_answers(all_answers)
        summary_csv = os.path.join(results_dir, f"summary_{shot}_shot.csv")
        summary.to_csv(summary_csv)
        artifacts["results"] = per_bench
        artifacts["summary_csv"] = summary_csv
        print(summary.round(2).to_string())

    manifest = os.path.join(out, "pipeline_manifest.json")
    with open(manifest, "w") as f:
        json.dump(artifacts, f, indent=1)
    artifacts["manifest"] = manifest
    return artifacts


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from iadr1_tpu.core.config import load_config
    from iadr1_tpu.core.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    cfg = load_config(PipelineConfig, args.config, args.overrides)
    run_pipeline(cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
