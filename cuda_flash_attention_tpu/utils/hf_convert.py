"""HuggingFace Llama-family weight import.

Users switching from a torch serving/training stack bring their checkpoints:
this maps a `transformers` Llama-architecture model (LlamaForCausalLM and
compatibles: same projection names, RMSNorm, SwiGLU, rotate-half RoPE) onto
this framework's param pytree.  Conventions that line up exactly:

  * RoPE: HF's rotate-half with inv_freq = theta^(-2i/d) IS this repo's
    half-rotation rope() — same frequencies, same sign structure.
  * RMSNorm eps 1e-6, no biases, head-major projection layout, GQA query
    head h -> KV head h // group: all identical.
  * HF nn.Linear stores [out, in]; this framework stores [in, out] — every
    projection transposes.

The round-trip also serves as an INDEPENDENT full-model oracle: a random
HF Llama evaluated under torch must produce the same logits as the
converted params under this stack (tests/test_hf_convert.py) — a
cross-implementation check of attention, normalization, RoPE, and GQA all
at once, in the spirit of the reference's torch-SDPA comparator
(/root/reference/test_flash_attention2.py:210-218).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cuda_flash_attention_tpu.models.transformer import TransformerConfig


def config_from_hf(hf_config, **overrides) -> TransformerConfig:
    """TransformerConfig from a transformers LlamaConfig-compatible object."""
    head_dim = getattr(hf_config, "head_dim", None) or (
        hf_config.hidden_size // hf_config.num_attention_heads
    )
    base = dict(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        n_kv_heads=getattr(hf_config, "num_key_value_heads", None)
        or hf_config.num_attention_heads,
        head_dim=head_dim,
        d_ff=hf_config.intermediate_size,
        rope_theta=float(getattr(hf_config, "rope_theta", 10000.0)),
    )
    base.update(overrides)
    return TransformerConfig(**base)


def _t(state_dict, name, dtype):
    """Fetch state_dict[name] as a transposed ([in, out]) jnp array."""
    w = state_dict[name]
    if hasattr(w, "detach"):  # torch tensor
        w = w.detach().to("cpu").float().numpy()
    return jnp.asarray(np.asarray(w).T, dtype)


def _vec(state_dict, name, dtype):
    w = state_dict[name]
    if hasattr(w, "detach"):
        w = w.detach().to("cpu").float().numpy()
    return jnp.asarray(np.asarray(w), dtype)


def params_from_hf(model_or_state_dict, cfg: TransformerConfig):
    """Convert a Llama-architecture HF model (or its state_dict) into this
    framework's param pytree (models/transformer.py layout)."""
    sd = model_or_state_dict
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    dtype = cfg.param_dtype
    layers = []
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        layers.append({
            "attn_norm": _vec(sd, pre + "input_layernorm.weight", dtype),
            "wq": _t(sd, pre + "self_attn.q_proj.weight", dtype),
            "wk": _t(sd, pre + "self_attn.k_proj.weight", dtype),
            "wv": _t(sd, pre + "self_attn.v_proj.weight", dtype),
            "wo": _t(sd, pre + "self_attn.o_proj.weight", dtype),
            "mlp_norm": _vec(
                sd, pre + "post_attention_layernorm.weight", dtype
            ),
            "w_gate": _t(sd, pre + "mlp.gate_proj.weight", dtype),
            "w_up": _t(sd, pre + "mlp.up_proj.weight", dtype),
            "w_down": _t(sd, pre + "mlp.down_proj.weight", dtype),
        })
    embed = _vec(sd, "model.embed_tokens.weight", dtype)
    if "lm_head.weight" in sd:
        lm_head = _t(sd, "lm_head.weight", dtype)
    else:  # tied embeddings
        lm_head = embed.T.astype(dtype)
    return {
        "embed": embed,
        "layers": layers,
        "final_norm": _vec(sd, "model.norm.weight", dtype),
        "lm_head": lm_head,
    }


def load_llama(model, **config_overrides):
    """One-call import: (params, cfg) from a transformers Llama model.

    ``config_overrides`` lets the caller turn on framework features the
    checkpoint doesn't encode (attn_window, rope_scaling, remat, ...)."""
    cfg = config_from_hf(model.config, **config_overrides)
    return params_from_hf(model, cfg), cfg
