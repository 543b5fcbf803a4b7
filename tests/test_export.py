"""HF export round-trip: convert -> export -> strict HF load + re-convert."""

import numpy as np
import pytest

import jax

from iadr1_tpu.models.params_export import export_params
from iadr1_tpu.models.params_io import hf_state_from_torch
from iadr1_tpu.models.registry import make_qwen2_bundle, make_qwen2_vl_bundle

TEXT = dict(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
)


def test_qwen2_export_roundtrip():
    bundle = make_qwen2_bundle({**TEXT, "architectures": ["Qwen2ForCausalLM"]},
                               attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    state = export_params(bundle, params)
    params2 = bundle.convert_hf(state)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_qwen2_vl_export_loads_into_hf():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    hf_cfg_dict = dict(
        architectures=["Qwen2VLForConditionalGeneration"],
        text_config=dict(**TEXT, rope_scaling={"type": "mrope",
                                               "mrope_section": [4, 2, 2]}),
        vision_config=dict(depth=2, embed_dim=32, hidden_size=64, num_heads=4,
                           patch_size=14, spatial_merge_size=2,
                           temporal_patch_size=2),
        image_token_id=7, video_token_id=8,
        vision_start_token_id=5, vision_end_token_id=6,
    )
    bundle = make_qwen2_vl_bundle(hf_cfg_dict, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    state = export_params(bundle, params)

    torch.manual_seed(0)
    hf_cfg = Qwen2VLConfig(
        vision_config=hf_cfg_dict["vision_config"],
        text_config={**TEXT, "rope_scaling": {"type": "mrope",
                                              "mrope_section": [4, 2, 2]}},
        image_token_id=7, video_token_id=8,
        vision_start_token_id=5, vision_end_token_id=6,
    )
    model = Qwen2VLForConditionalGeneration(hf_cfg)
    missing, unexpected = model.load_state_dict(
        {k: torch.tensor(v) for k, v in state.items()}, strict=False
    )
    assert not unexpected, unexpected
    # rotary inv_freq buffers are the only acceptable missing entries
    assert all("inv_freq" in k or "rotary" in k for k in missing), missing

    # and the re-imported weights match the originals numerically
    params2 = bundle.convert_hf(hf_state_from_torch(model))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
