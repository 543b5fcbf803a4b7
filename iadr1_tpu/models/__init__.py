"""Model zoo: functional JAX implementations of the reference's VLM families.

Reference coverage (README.md:233-243, sc_grpo_trainer.py:116-137):
LLaVA-OneVision-SI-0.5B/7B, Qwen2-VL-2B, Qwen2.5-VL-3B/7B/72B,
LLaVA-1.5-7B/13B, LLaVA-1.6-8B/34B, InternVL-2.5-4B.

Design: parameters are plain pytrees (nested dicts of jnp arrays) with a
parallel pytree of logical-axis tuples for sharding; every model is a pure
``apply(params, cfg, ...)`` function.  Decoder layers are stacked on a
leading layer axis and driven by ``lax.scan`` for fast compiles and clean
rematerialization.
"""
