"""Int8 weight-only quantization: roundtrip accuracy, forward fidelity,
generation through the rollout engine (models/quant.py; counterpart of the
reference's model/patcher quantization hooks)."""

import numpy as np

import jax
import jax.numpy as jnp

from iadr1_tpu.models.quant import (
    default_quant_predicate,
    dequantize_kernel,
    is_quantized,
    quantize_kernel,
    quantize_tree,
    quantized_bytes,
)
from iadr1_tpu.models.registry import make_qwen2_bundle
from iadr1_tpu.train.rollout import RolloutEngine, SamplingConfig

TINY = dict(
    vocab_size=600, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, tie_word_embeddings=True,
    architectures=["Qwen2ForCausalLM"],
)


def test_kernel_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 32, 48)) * 0.2
    qk = quantize_kernel(w)
    assert qk["qvalues"].dtype == jnp.int8
    assert qk["scales"].shape == (3, 1, 48)
    deq = dequantize_kernel(qk)
    # per-channel symmetric int8: max error bounded by scale/2 per channel
    err = np.abs(np.asarray(deq) - np.asarray(w))
    bound = np.asarray(qk["scales"]) / 2 + 1e-7
    assert (err <= bound).all()


def test_quantize_tree_targets():
    bundle = make_qwen2_bundle(TINY, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = quantize_tree(params)
    assert is_quantized(qparams["layers"]["mlp"]["up"]["kernel"])
    assert is_quantized(qparams["layers"]["attn"]["q"]["kernel"])
    # embeddings (and the tied head) stay full precision
    assert qparams["embed"]["weight"].dtype == jnp.bfloat16
    now, bf16 = quantized_bytes(qparams)
    assert now < bf16  # actual shrink


def test_quantized_forward_close():
    bundle = make_qwen2_bundle(TINY, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    qparams = quantize_tree(params)
    rng = np.random.default_rng(0)
    B, T = 2, 16
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 600, (B, T)), jnp.int32),
        "segment_ids": jnp.ones((B, T), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(T), (B, T)).copy(), jnp.int32),
    }
    full = np.asarray(jax.jit(bundle.forward)(params, batch), np.float64)
    quant = np.asarray(jax.jit(bundle.forward)(qparams, batch), np.float64)
    # logits track closely; ranking of the argmax token is preserved for
    # the overwhelming majority of positions
    denom = np.abs(full).max()
    assert np.abs(full - quant).max() / denom < 0.15
    agree = (full.argmax(-1) == quant.argmax(-1)).mean()
    assert agree > 0.9


def test_int4_roundtrip_and_layout():
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 64, 48)) * 0.2
    qk = quantize_kernel(w, fmt="int4", block_size=32)
    assert qk["q4"].dtype == jnp.uint8
    assert qk["q4"].shape == (3, 32, 48)       # two values per byte
    assert qk["scales"].shape == (3, 2, 48)    # 64 / block 32
    from iadr1_tpu.models.quant import quantized_shape

    assert quantized_shape(qk) == (3, 64, 48)
    deq = np.asarray(dequantize_kernel(qk))
    # symmetric RTN on [-7, 7]: error <= half a step = absmax/14 per block
    scales = np.asarray(qk["scales"])[:, :, None, :]
    err = np.abs(deq - np.asarray(w)).reshape(3, 2, 32, 48)
    assert (err <= scales / 14 + 1e-6).all()
    # grid values roundtrip exactly
    grid = (np.repeat(np.arange(-7, 8), 2) / 7.0)[None, :, None] * np.full(
        (1, 30, 4), 0.3)
    qg = quantize_kernel(jnp.asarray(grid * 1.0), fmt="int4", block_size=30)
    np.testing.assert_allclose(np.asarray(dequantize_kernel(qg)), grid,
                               atol=1e-6)


def test_nf4_roundtrip():
    from iadr1_tpu.models.quant import NF4_CODE

    w = jax.random.normal(jax.random.PRNGKey(2), (128, 32)) * 0.1
    qk = quantize_kernel(w, fmt="nf4", block_size=64)
    assert qk["nf4"].shape == (64, 32)
    assert qk["scales"].shape == (2, 32)
    deq = np.asarray(dequantize_kernel(qk))
    # error <= half the widest codebook gap times the block absmax
    gaps = np.diff(np.asarray(NF4_CODE))
    scales = np.asarray(qk["scales"])[:, None, :]
    err = np.abs(deq - np.asarray(w)).reshape(2, 64, 32)
    assert (err <= scales * gaps.max() / 2 + 1e-6).all()
    # codebook values scale-roundtrip exactly
    code = np.asarray(NF4_CODE)[None, :, None] * np.full((1, 16, 4), 0.7)
    qc = quantize_kernel(jnp.asarray(code * 1.0), fmt="nf4", block_size=16)
    np.testing.assert_allclose(np.asarray(dequantize_kernel(qc)), code,
                               rtol=1e-6, atol=1e-7)


def test_nf4_forward_close():
    bundle = make_qwen2_bundle(TINY, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    qparams = quantize_tree(params, fmt="nf4")
    now, bf16 = quantized_bytes(qparams)
    assert now < bf16
    # per-kernel: packed bytes ~ bf16/4 (+ scale overhead 1/block)
    qk = qparams["layers"]["mlp"]["up"]["kernel"]
    kb_now = qk["nf4"].size + qk["scales"].size * 4
    in_dim, out = 64, 128
    layers = 2
    assert kb_now <= (2 * layers * in_dim * out) * (0.25 + 4 / 64 / 2 + 0.01)
    rng = np.random.default_rng(0)
    B, T = 2, 16
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 600, (B, T)), jnp.int32),
        "segment_ids": jnp.ones((B, T), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(T), (B, T)).copy(), jnp.int32),
    }
    full = np.asarray(jax.jit(bundle.forward)(params, batch), np.float64)
    quant = np.asarray(jax.jit(bundle.forward)(qparams, batch), np.float64)
    denom = np.abs(full).max()
    assert np.abs(full - quant).max() / denom < 0.25
    assert (full.argmax(-1) == quant.argmax(-1)).mean() > 0.8


def test_qlora_trains_on_quantized_base():
    """QLoRA composition (reference adapter.py + model_utils/quantization):
    int4 base + factored LoRA adapters -- the SFT step updates ONLY the
    adapters, the loss decreases, and merge_lora exports a dense model
    whose forward matches base+adapters."""
    import optax

    from iadr1_tpu.data.tokenize import IGNORE_INDEX
    from iadr1_tpu.train.adapters import (
        TuningConfig, init_lora_params, merge_lora,
    )

    bundle = make_qwen2_bundle(TINY, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    qbase = quantize_tree(params, fmt="int4")
    tcfg = TuningConfig(finetuning_type="lora", lora_rank=4)
    lora = init_lora_params(jax.random.PRNGKey(1), params=qbase, cfg=tcfg)
    # adapters exist on quantized kernels
    assert lora["layers"]["attn"]["q"]["kernel"]["a"].shape[-1] == 4

    rng = np.random.default_rng(0)
    B, T = 2, 24
    ids = rng.integers(1, 600, (B, T))
    labels = ids.copy()
    labels[:, : T // 3] = IGNORE_INDEX
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "segment_ids": jnp.ones((B, T), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(T), (B, T)).copy(), jnp.int32),
    }

    from iadr1_tpu.train.sft import chunked_sft_loss

    def loss_fn(lora_p):
        hidden = bundle.hidden_fn(qbase, batch, remat=False, lora=lora_p,
                                  lora_scale=tcfg.lora_scale)
        return chunked_sft_loss(hidden, bundle.head_kernel_fn(qbase),
                                batch["labels"], chunk_size=16)[0]

    opt = optax.adam(5e-3)
    opt_state = opt.init(lora)

    @jax.jit
    def step(lora_p, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(lora_p)
        updates, opt_state = opt.update(grads, opt_state, lora_p)
        return optax.apply_updates(lora_p, updates), opt_state, loss

    losses = []
    for _ in range(8):
        lora, opt_state, loss = step(lora, opt_state)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"QLoRA did not learn: {losses}"

    # merged export forward == quantized-base + adapters forward.  Compare
    # under an f32 compute policy: the default bf16 activations round the
    # factored two-term sum differently from the merged single matmul
    # (~3e-2 at bf16 -- inherent to factored LoRA, same as peft), which
    # would mask a real merge bug at any usable tolerance.
    from iadr1_tpu.core.precision import Precision

    f32 = make_qwen2_bundle(TINY, attention="xla",
                            precision=Precision(compute_dtype=jnp.float32))
    merged = merge_lora(qbase, lora, tcfg)
    assert not is_quantized(merged["layers"]["attn"]["q"]["kernel"])

    def lora_logits(p, l):
        h = f32.hidden_fn(p, batch, remat=False, lora=l,
                          lora_scale=tcfg.lora_scale)
        return h @ f32.head_kernel_fn(p)

    out_lora = np.asarray(jax.jit(lora_logits)(qbase, lora))
    out_merged = np.asarray(jax.jit(f32.forward)(merged, batch))
    np.testing.assert_allclose(out_lora, out_merged, rtol=2e-4, atol=2e-4)


def test_quantized_generation_runs():
    bundle = make_qwen2_bundle(TINY, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = quantize_tree(params)
    sampling = SamplingConfig(max_new_tokens=4, temperature=0.0,
                              eos_token_id=-1, pad_token_id=0)
    engine = RolloutEngine(bundle, sampling, max_len=16)
    batch = {
        "input_ids": jnp.asarray([[5, 6, 7, 8]], jnp.int32),
        "attention_mask": jnp.ones((1, 4), jnp.int32),
    }
    out = engine.generate(qparams, batch, jax.random.PRNGKey(0))
    ids = np.asarray(out["completion_ids"])
    assert ids.shape == (1, 4)
    assert (ids >= 0).all()


# ---------------------------------------------------------------------------
# GPTQ / AWQ pre-quantized checkpoint import (params_io)
# ---------------------------------------------------------------------------


def _pack_gptq(q, zeros, scales):
    """Reference GPTQ packing: q uint4 [in, out] -> qweight int32
    [in/8, out] (low nibble first); zeros z (the dequant zero point)
    stored as qzeros = z-1, packed int32 [nb, out/8]."""
    in_dim, out = q.shape
    qweight = np.zeros((in_dim // 8, out), np.int64)
    for j in range(8):
        qweight |= q[j::8].astype(np.int64) << (4 * j)
    zm1 = (zeros - 1).astype(np.int64)
    qzeros = np.zeros((zeros.shape[0], out // 8), np.int64)
    for j in range(8):
        qzeros |= zm1[:, j::8] << (4 * j)
    return (qweight.astype(np.int32), qzeros.astype(np.int32),
            scales.astype(np.float16))


def _pack_awq(q, zeros, scales):
    """Reference AWQ GEMM packing: columns interleaved [0,2,4,6,1,3,5,7]."""
    order = [0, 2, 4, 6, 1, 3, 5, 7]
    in_dim, out = q.shape
    qweight = np.zeros((in_dim, out // 8), np.int64)
    qzeros = np.zeros((zeros.shape[0], out // 8), np.int64)
    for j, col in enumerate(order):
        qweight |= q[:, col::8].astype(np.int64) << (4 * j)
        qzeros |= zeros[:, col::8].astype(np.int64) << (4 * j)
    return (qweight.astype(np.int32), qzeros.astype(np.int32),
            scales.astype(np.float16))


def _random_asym(in_dim, out, group, seed):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 16, (in_dim, out), np.uint8)
    nb = in_dim // group
    zeros = rng.integers(1, 15, (nb, out), np.uint8)  # z-1 must fit uint4
    scales = (rng.random((nb, out), np.float32) * 0.05 + 0.01)
    expected = ((q.reshape(nb, group, out).astype(np.float32)
                 - zeros[:, None].astype(np.float32))
                * scales[:, None]).reshape(in_dim, out)
    return q, zeros, scales, expected


def test_gptq_import_exact():
    from iadr1_tpu.models.params_io import convert_prequantized_state

    q, zeros, scales, expected = _random_asym(32, 16, 8, seed=0)
    qweight, qzeros, qscales = _pack_gptq(q, zeros, scales)
    state = {
        "model.layers.0.self_attn.q_proj.qweight": qweight,
        "model.layers.0.self_attn.q_proj.qzeros": qzeros,
        "model.layers.0.self_attn.q_proj.scales": qscales,
        "model.layers.0.self_attn.q_proj.g_idx":
            (np.arange(32) // 8).astype(np.int32),
    }
    out = convert_prequantized_state(state)
    qd = out["model.layers.0.self_attn.q_proj.weight"]
    assert is_quantized(qd)
    got = np.asarray(dequantize_kernel(
        {k: jnp.asarray(v) for k, v in qd.items()}))
    np.testing.assert_allclose(got, expected.astype(np.float16), atol=1e-3)
    assert not any(k.endswith(".qweight") for k in out)


def test_gptq_desc_act_rejected():
    import pytest

    from iadr1_tpu.models.params_io import gptq_layer_to_quant

    q, zeros, scales, _ = _random_asym(32, 16, 8, seed=1)
    qweight, qzeros, qscales = _pack_gptq(q, zeros, scales)
    perm = np.random.default_rng(0).permutation(32) // 8
    with pytest.raises(NotImplementedError):
        gptq_layer_to_quant(qweight, qzeros, qscales,
                            g_idx=perm.astype(np.int32))


def test_awq_import_exact():
    from iadr1_tpu.models.params_io import awq_layer_to_quant

    q, zeros, scales, expected = _random_asym(32, 16, 8, seed=2)
    qweight, qzeros, qscales = _pack_awq(q, zeros, scales)
    qd = awq_layer_to_quant(qweight, qzeros, qscales)
    got = np.asarray(dequantize_kernel(
        {k: jnp.asarray(v) for k, v in qd.items()}))
    np.testing.assert_allclose(got, expected.astype(np.float16), atol=1e-3)


def test_gptq_checkpoint_trains_lora(tmp_path):
    """A synthetic GPTQ qwen2 checkpoint loads through the normal path
    (load_safetensors_path -> convert_hf) and trains a LoRA step -- the
    reference's pre-quantized-hub flow (model_utils/quantization.py)."""
    from safetensors.numpy import save_file

    from iadr1_tpu.data.tokenize import IGNORE_INDEX
    from iadr1_tpu.models.params_io import load_safetensors_path
    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.adapters import TuningConfig, init_lora_params
    from iadr1_tpu.train.sft import make_chunked_sft_step
    from iadr1_tpu.train.state import create_train_state

    hid, inter, vocab, L, group = 64, 96, 256, 2, 32
    rng = np.random.default_rng(3)
    state = {}
    def add_linear(name, in_dim, out):
        q, zeros, scales, _ = _random_asym(in_dim, out, group,
                                           seed=abs(hash(name)) % 2**31)
        qw, qz, sc = _pack_gptq(q, zeros, scales)
        state[f"{name}.qweight"] = qw
        state[f"{name}.qzeros"] = qz
        state[f"{name}.scales"] = sc
        state[f"{name}.g_idx"] = (np.arange(in_dim) // group).astype(np.int32)
    for i in range(L):
        p = f"model.layers.{i}"
        for proj, (i_d, o_d) in {
            "self_attn.q_proj": (hid, hid), "self_attn.k_proj": (hid, 32),
            "self_attn.v_proj": (hid, 32), "self_attn.o_proj": (hid, hid),
            "mlp.gate_proj": (hid, inter), "mlp.up_proj": (hid, inter),
            "mlp.down_proj": (inter, hid),
        }.items():
            add_linear(f"{p}.{proj}", i_d, o_d)
        state[f"{p}.input_layernorm.weight"] = np.ones(hid, np.float32)
        state[f"{p}.post_attention_layernorm.weight"] = np.ones(hid, np.float32)
    state["model.embed_tokens.weight"] = (
        rng.standard_normal((vocab, hid)).astype(np.float32) * 0.02)
    state["model.norm.weight"] = np.ones(hid, np.float32)
    save_file(state, str(tmp_path / "model.safetensors"))

    loaded = load_safetensors_path(str(tmp_path))
    hf = dict(architectures=["Qwen2ForCausalLM"], vocab_size=vocab,
              hidden_size=hid, intermediate_size=inter, num_hidden_layers=L,
              num_attention_heads=4, num_key_value_heads=2, rope_theta=1e4,
              tie_word_embeddings=True, attention_bias=False)
    bundle = make_qwen2_bundle(hf, attention="xla")
    params = bundle.convert_hf(loaded)
    assert is_quantized(params["layers"]["mlp"]["gate"]["kernel"])

    tcfg = TuningConfig(finetuning_type="lora", lora_rank=4)
    lora = init_lora_params(jax.random.PRNGKey(0), params, tcfg)
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-2, total_steps=4, warmup_ratio=0.0))
    stt = create_train_state(lora, optimizer)

    def hidden_fn(lp, b):
        return bundle.hidden_fn(params, b, remat=False, lora=lp,
                                lora_scale=tcfg.lora_scale)

    step = make_chunked_sft_step(
        hidden_fn, lambda _lp: bundle.head_kernel_fn(params), optimizer,
        schedule, chunk_size=16)
    ids = np.random.default_rng(4).integers(1, vocab, (2, 32))
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "labels": jnp.asarray(
            np.where(np.arange(32) < 8, IGNORE_INDEX, ids), jnp.int32),
        "segment_ids": jnp.ones((2, 32), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(32), (2, 32)).copy(), jnp.int32),
    }
    stt, metrics = step(stt, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 1e-8
