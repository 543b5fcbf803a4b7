"""Export an Orbax training checkpoint to an HF-format model directory.

The counterpart of ``llamafactory-cli export`` (train/tuner.py
export_model:95-173): after PA-SFT/SC-GRPO, produce a directory the next
stage, the eval harness, or any HF consumer can load.

Usage:
    python -m iadr1_tpu.cli.export --model-path <source HF ckpt> \
        --checkpoint-dir output/run/checkpoints [--step N] --output-dir out/export
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-path", required=True,
                        help="source HF checkpoint (config/tokenizer + shapes)")
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument("--output-dir", required=True)
    args = parser.parse_args(argv)

    import jax

    from iadr1_tpu.models.params_export import save_pretrained
    from iadr1_tpu.models.params_io import load_safetensors_path
    from iadr1_tpu.models.registry import bundle_from_pretrained
    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.checkpoint import CheckpointManager
    from iadr1_tpu.train.state import create_train_state

    bundle = bundle_from_pretrained(args.model_path, attention="xla")
    params = bundle.convert_hf(load_safetensors_path(args.model_path))
    optimizer, _ = make_optimizer(OptimizerConfig())
    state_like = jax.eval_shape(
        lambda p: create_train_state(p, optimizer), params
    )
    state_like = jax.tree.map(
        lambda s: jax.numpy.zeros(s.shape, s.dtype), state_like
    )
    mgr = CheckpointManager(args.checkpoint_dir)
    state = mgr.restore(state_like, step=args.step)
    save_pretrained(bundle, state.params, args.output_dir,
                    source_dir=args.model_path)
    print(f"exported step {args.step or mgr.latest_step()} -> {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
