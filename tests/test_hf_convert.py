"""HF Llama import: converted weights must reproduce the torch model's
logits — an independent full-model oracle (attention + RMSNorm + RoPE +
GQA + SwiGLU cross-checked against a foreign implementation at once)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from cuda_flash_attention_tpu.models import forward
from cuda_flash_attention_tpu.utils.hf_convert import (
    config_from_hf,
    load_llama,
    params_from_hf,
)


def _tiny_hf(seed=0, tie=False):
    torch.manual_seed(seed)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=64, rope_theta=10000.0, tie_word_embeddings=tie,
    )
    model = transformers.LlamaForCausalLM(hf_cfg)
    model.eval()
    return model


@pytest.mark.slow
def test_logits_match_torch():
    model = _tiny_hf()
    params, cfg = load_llama(
        model, dtype=jnp.float32, attn_tile_dtype=None,
    )
    assert cfg.n_heads == 4 and cfg.n_kv_heads == 2 and cfg.head_dim == 64

    ids = np.random.default_rng(0).integers(0, 256, size=(2, 48))
    with torch.no_grad():
        ref = model(torch.asarray(ids)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids, jnp.int32), cfg))
    err = np.abs(got - ref).max()
    assert err < 2e-4, err


@pytest.mark.slow
def test_greedy_generation_matches_torch():
    model = _tiny_hf(seed=1)
    params, cfg = load_llama(model, dtype=jnp.float32, attn_tile_dtype=None)

    from cuda_flash_attention_tpu.decode import DecodeEngine

    prompt = [5, 17, 100, 42, 7]
    steps = 5
    with torch.no_grad():
        out = model.generate(
            torch.asarray([prompt]), max_new_tokens=steps, do_sample=False,
            num_beams=1, pad_token_id=0,
        )[0, len(prompt):].tolist()

    eng = DecodeEngine(params, cfg, max_seqs=1, max_seq_len=256,
                       page_size=128, cache_dtype=jnp.float32)
    req = eng.run([prompt], max_new_tokens=steps)[0]
    assert req.generated == out, (req.generated, out)


def test_tied_embeddings_and_config_mapping():
    model = _tiny_hf(seed=2, tie=True)
    cfg = config_from_hf(model.config, dtype=jnp.float32,
                         attn_tile_dtype=None)
    params = params_from_hf(model, cfg)
    # Tied: lm_head is the embedding transposed.
    np.testing.assert_array_equal(
        np.asarray(params["lm_head"]), np.asarray(params["embed"]).T
    )
    ids = np.random.default_rng(1).integers(0, 256, size=(1, 16))
    with torch.no_grad():
        ref = model(torch.asarray(ids)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids, jnp.int32), cfg))
    assert np.abs(got - ref).max() < 2e-4
