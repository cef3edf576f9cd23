"""Decode-mode model functions: prefill (fill the paged cache) and the
single-token decode step over paged attention.

Reuses the flagship transformer's param pytree and building blocks
(models/transformer.py) — same weights serve training and serving. The
reference has no serving path (SURVEY.md §2); its closest analog is the
forward-artifacts-feed-backward contract (O/logsumexp .bin round trip,
/root/reference/src/main.cpp:66-92), which here generalizes to "prefill
artifacts (KV pages) feed the decode steps".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cuda_flash_attention_tpu.decode.attention import paged_decode_attention
from cuda_flash_attention_tpu.decode.kv_cache import KVPages, append_token_kv
from cuda_flash_attention_tpu.models.transformer import (
    TransformerConfig,
    ffn_block,
    gqa_flash_attention,
    rms_norm,
    rope,
)
from cuda_flash_attention_tpu.quant.linear import dense


def prefill_forward(params, tokens, cfg: TransformerConfig, mesh=None):
    """Full causal forward over a prompt batch [B, S]; returns
    (logits [B, S, vocab], per-layer (k, v) with shape [B, S, Hkv, D]) —
    the K/V are post-RoPE, exactly what the cache stores.  With `mesh`,
    attention runs head-parallel/ring exactly like training forward."""
    b, s = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    # Gather THEN convert: casting the whole [vocab, d] table costs a
    # full-table HBM pass per step (profiled 0.3 ms at vocab 32k).
    x = params["embed"][tokens].astype(cfg.dtype)
    kv_out = []
    for layer in params["layers"]:
        h = rms_norm(x, layer["attn_norm"])
        q = dense(h, layer["wq"]).reshape(b, s, cfg.n_heads, cfg.head_dim)
        k = dense(h, layer["wk"]).reshape(b, s, cfg.n_kv_heads, cfg.head_dim)
        v = dense(h, layer["wv"]).reshape(b, s, cfg.n_kv_heads, cfg.head_dim)
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)
        kv_out.append((k, v))
        o = gqa_flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), cfg=cfg, mesh=mesh, causal=True,
        )
        o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.q_dim)
        x = x + dense(o, layer["wo"])
        x, _ = ffn_block(x, layer, cfg, mesh)  # dense or MoE (aux unused)
    x = rms_norm(x, params["final_norm"])
    logits = dense(x, params["lm_head"]).astype(jnp.float32)
    return logits, kv_out


def decode_step(
    params,
    tokens,      # [num_seqs] int32 — last sampled token per slot
    positions,   # [num_seqs] int32 — write position (= current length)
    caches,      # list[KVPages], one per layer
    page_table,  # [num_seqs, pages_per_seq] int32
    active,      # [num_seqs] bool
    cfg: TransformerConfig,
    *,
    mesh=None,
    interpret=None,
):
    """One decode step for all slots: append each layer's new K/V to the
    paged cache, attend over pages, return (logits [num_seqs, vocab],
    new_caches).  With `mesh`, attention runs head-parallel over the model
    axis (decode/sharded.py) and dense projections partition under pjit."""
    n = tokens.shape[0]
    # Gather THEN convert: casting the whole [vocab, d] table costs a
    # full-table HBM pass per step (profiled 0.3 ms at vocab 32k).
    x = params["embed"][tokens].astype(cfg.dtype)  # [n, d_model]
    pos2 = positions[:, None]  # [n, 1] for rope's [B, S] contract
    attn_lengths = jnp.where(active, positions + 1, 0)
    compute_dtype = (
        jnp.float32 if cfg.attn_tile_dtype is None else jnp.bfloat16
    )
    new_caches = []
    for layer, pages in zip(params["layers"], caches):
        h = rms_norm(x, layer["attn_norm"])
        q = dense(h, layer["wq"]).reshape(n, 1, cfg.n_heads, cfg.head_dim)
        k = dense(h, layer["wk"]).reshape(n, 1, cfg.n_kv_heads, cfg.head_dim)
        v = dense(h, layer["wv"]).reshape(n, 1, cfg.n_kv_heads, cfg.head_dim)
        q = rope(q, pos2, cfg.rope_theta)[:, 0]  # [n, Hq, D]
        k = rope(k, pos2, cfg.rope_theta)[:, 0]  # [n, Hkv, D]
        v = v[:, 0]
        pages = append_token_kv(pages, k, v, page_table, positions, active)
        new_caches.append(pages)
        if mesh is not None:
            from cuda_flash_attention_tpu.decode.sharded import (
                tp_paged_decode_attention,
            )

            o = tp_paged_decode_attention(
                mesh, q.astype(cfg.dtype), pages, page_table, attn_lengths,
                compute_dtype=compute_dtype,
            )
        else:
            o = paged_decode_attention(
                q.astype(cfg.dtype), pages, page_table, attn_lengths,
                compute_dtype=compute_dtype,
                interpret=interpret,
            )  # [n, Hq, D]
        x = x + dense(o.reshape(n, cfg.q_dim), layer["wo"])
        x, _ = ffn_block(x, layer, cfg, mesh)  # dense or MoE (aux unused)
    x = rms_norm(x, params["final_norm"])
    logits = dense(x, params["lm_head"]).astype(jnp.float32)
    return logits, new_caches
