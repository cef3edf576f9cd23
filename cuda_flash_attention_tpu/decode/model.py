"""Decode-mode model functions: prefill (fill the paged cache) and the
single-token decode step over paged attention.

Reuses the flagship transformer's param pytree and building blocks
(models/transformer.py) — same weights serve training and serving. The
reference has no serving path (SURVEY.md §2); its closest analog is the
forward-artifacts-feed-backward contract (O/logsumexp .bin round trip,
/root/reference/src/main.cpp:66-92), which here generalizes to "prefill
artifacts (KV pages) feed the decode steps".

Two layer-loop forms, chosen by the caches' layout:

  * SCANNED (caches = one stacked KVPages, params["layers"] = stacked
    pytree from models.stack_layer_params): a single `lax.scan` body covers
    every layer.  This collapses the ~n_layers x ~12 separate XLA ops of
    the Python loop into ONE compiled body — the round-2 decode step was
    op-dispatch-bound (1.12 ms vs the 0.62 ms weight-streaming floor at the
    254M config) precisely because of that dispatch fan-out.
  * LOOP (caches = list of per-layer KVPages, params["layers"] = list):
    kept for heterogeneous layer stacks (MoE interleave) which cannot
    stack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from cuda_flash_attention_tpu.decode.attention import (
    paged_chunk_attention,
    paged_decode_attention,
)
from cuda_flash_attention_tpu.decode.kv_cache import (
    KVPages,
    append_chunk_kv,
    append_token_kv,
    write_chunk_kv_paged,
)
from cuda_flash_attention_tpu.models.transformer import (
    TransformerConfig,
    ffn_block,
    gqa_flash_attention,
    rms_norm,
    rope,
)
from cuda_flash_attention_tpu.quant.linear import dense


def _table_for(page_table, i: int):
    """Per-layer page-table selector: the engine passes ONE table for a
    homogeneous cache, or a per-layer tuple under the HYBRID cache (layers
    grouped by window share a table; local groups recycle pages behind
    their window while global groups keep full history)."""
    if isinstance(page_table, (list, tuple)):
        return page_table[i]
    return page_table


def _prefill_layer(x, layer, positions, cfg: TransformerConfig, mesh,
                   window=None):
    """One prefill layer: returns (x, (k, v)) with k/v post-RoPE
    [B, S, Hkv, D] — exactly what the cache stores."""
    b, s = x.shape[:2]
    h = rms_norm(x, layer["attn_norm"])
    q = dense(h, layer["wq"]).reshape(b, s, cfg.n_heads, cfg.head_dim)
    k = dense(h, layer["wk"]).reshape(b, s, cfg.n_kv_heads, cfg.head_dim)
    v = dense(h, layer["wv"]).reshape(b, s, cfg.n_kv_heads, cfg.head_dim)
    q = rope(q, positions, *cfg.rope_args)
    k = rope(k, positions, *cfg.rope_args)
    o = gqa_flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), cfg=cfg, mesh=mesh, causal=True,
        window=window,
    )
    o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.q_dim)
    x = x + dense(o, layer["wo"])
    x, _ = ffn_block(x, layer, cfg, mesh)  # dense or MoE (aux unused)
    return x, (k, v)


def prefill_forward(params, tokens, cfg: TransformerConfig, mesh=None,
                    last_only: bool = False):
    """Full causal forward over a prompt batch [B, S]; returns
    (logits [B, S, vocab], kv) where kv is per-layer post-RoPE K/V:
    a list of (k, v) [B, S, Hkv, D] for list-form params, or a stacked
    (k [L, B, S, Hkv, D], v [L, ...]) pair for stacked params (the
    engine's scanned form).  With `mesh`, attention runs
    head-parallel/ring exactly like training forward.  The LIST form
    supports per-layer local/global windows (cfg.layer_window); the
    stacked scan requires a uniform window."""
    b, s = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    # Gather THEN convert: casting the whole [vocab, d] table costs a
    # full-table HBM pass per step (profiled 0.3 ms at vocab 32k).
    x = params["embed"][tokens].astype(cfg.dtype)
    layers = params["layers"]
    if isinstance(layers, (list, tuple)):
        kv_out = []
        for i, layer in enumerate(layers):
            x, kv = _prefill_layer(x, layer, positions, cfg, mesh,
                                   window=cfg.layer_window(i))
            kv_out.append(kv)
    else:
        _check_uniform_window(cfg)

        def body(x, layer):
            return _prefill_layer(x, layer, positions, cfg, mesh,
                                  window=cfg.attn_window)

        x, kv_out = lax.scan(body, x, layers)
    x = rms_norm(x, params["final_norm"])
    if last_only:
        # Long-prompt prefill only needs the next-token logits: the full
        # [B, S, vocab] tensor is the largest array in the program by far
        # (8.6 GB at B8/S8192/V32k fp32 — an OOM, not a slowdown).
        x = x[:, -1:, :]
    logits = dense(x, params["lm_head"]).astype(jnp.float32)
    return logits, kv_out


def _decode_layer(x, layer, pages, pos2, positions, attn_lengths, page_table,
                  active, cfg: TransformerConfig, mesh, interpret,
                  compute_dtype, window=None, sinks=0):
    """One decode layer over a per-layer KVPages: returns (x, new_pages).
    ``window``/``sinks`` are THIS layer's (local/global interleaves pass
    cfg.layer_window(i) in the list path)."""
    n = x.shape[0]
    h = rms_norm(x, layer["attn_norm"])
    q = dense(h, layer["wq"]).reshape(n, 1, cfg.n_heads, cfg.head_dim)
    k = dense(h, layer["wk"]).reshape(n, 1, cfg.n_kv_heads, cfg.head_dim)
    v = dense(h, layer["wv"]).reshape(n, 1, cfg.n_kv_heads, cfg.head_dim)
    q = rope(q, pos2, *cfg.rope_args)[:, 0]  # [n, Hq, D]
    k = rope(k, pos2, *cfg.rope_args)[:, 0]  # [n, Hkv, D]
    v = v[:, 0]
    from cuda_flash_attention_tpu.parallel.mesh import DATA_AXIS

    if mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1:
        # Multi-host serving: slots AND the page pool shard over "data"
        # (page_table carries shard-local ids) — append + attention run as
        # one communication-free shard_map (decode/sharded.py).
        from cuda_flash_attention_tpu.decode.sharded import dp_tp_append_attend

        o, pages = dp_tp_append_attend(
            mesh, q.astype(cfg.dtype), k, v, pages, page_table, positions,
            active, attn_lengths, compute_dtype=compute_dtype,
            window=window, sinks=sinks,
        )
    else:
        pages = append_token_kv(pages, k, v, page_table, positions, active)
        if mesh is not None:
            from cuda_flash_attention_tpu.decode.sharded import (
                tp_paged_decode_attention,
            )

            o = tp_paged_decode_attention(
                mesh, q.astype(cfg.dtype), pages, page_table, attn_lengths,
                compute_dtype=compute_dtype, window=window, sinks=sinks,
            )
        else:
            o = paged_decode_attention(
                q.astype(cfg.dtype), pages, page_table, attn_lengths,
                compute_dtype=compute_dtype, window=window,
                sinks=sinks, interpret=interpret,
            )  # [n, Hq, D]
    x = x + dense(o.reshape(n, cfg.q_dim), layer["wo"])
    x, _ = ffn_block(x, layer, cfg, mesh)  # dense or MoE (aux unused)
    return x, pages


def _chunk_layer(x, layer, pages, pos_t, first_positions, total_lengths,
                 page_table, active, cfg: TransformerConfig, interpret,
                 compute_dtype, paged_write=False, mesh=None, window=None,
                 sinks=0):
    """One verification layer: T new tokens per slot flow [n, T, d_model];
    their K/V append to the paged cache, then chunked paged attention reads
    it back (each token causally bounded at its own position).

    ``paged_write`` switches the cache write from T per-token scatters
    (speculative chunks: tiny T, arbitrary alignment) to one page-granular
    scatter (chunked/suffix prefill: page-aligned start, whole pages).
    With ``mesh`` (a model axis), write + attention run head-parallel as a
    shard_map island (decode/sharded.tp_chunk_append_attend)."""
    n, t = x.shape[:2]
    h = rms_norm(x, layer["attn_norm"])
    q = dense(h, layer["wq"]).reshape(n, t, cfg.n_heads, cfg.head_dim)
    k = dense(h, layer["wk"]).reshape(n, t, cfg.n_kv_heads, cfg.head_dim)
    v = dense(h, layer["wv"]).reshape(n, t, cfg.n_kv_heads, cfg.head_dim)
    q = rope(q, pos_t, *cfg.rope_args)
    k = rope(k, pos_t, *cfg.rope_args)
    if mesh is not None:
        from cuda_flash_attention_tpu.decode.sharded import (
            tp_chunk_append_attend,
        )

        o, pages = tp_chunk_append_attend(
            mesh, q.astype(cfg.dtype), k, v, pages, page_table,
            first_positions, active, total_lengths,
            paged_write=paged_write, compute_dtype=compute_dtype,
            window=window, sinks=sinks,
        )
    else:
        write = write_chunk_kv_paged if paged_write else append_chunk_kv
        pages = write(pages, k, v, page_table, first_positions, active)
        o = paged_chunk_attention(
            q.astype(cfg.dtype), pages, page_table, total_lengths,
            compute_dtype=compute_dtype, window=window,
            sinks=sinks, interpret=interpret,
        )  # [n, T, Hq, D]
    x = x + dense(o.reshape(n, t, cfg.q_dim), layer["wo"])
    x, _ = ffn_block(x, layer, cfg, mesh)
    return x, pages


def verify_step(
    params,
    chunk_tokens,     # [num_seqs, T] int32 — last accepted token + T-1 drafts
    first_positions,  # [num_seqs] int32 — write position of the chunk start
    caches,           # stacked KVPages or list[KVPages]
    page_table,       # [num_seqs, pages_per_seq] int32
    active,           # [num_seqs] bool
    cfg: TransformerConfig,
    *,
    paged_write: bool = False,
    mesh=None,
    interpret=None,
):
    """Speculative-decoding verification: ONE forward scores all T chunk
    positions (logits [num_seqs, T, vocab]) while appending their K/V —
    the target model's side of draft-and-verify.  T=1 degenerates to
    `decode_step`.  Single-host (the driving loop is host-side); with
    ``mesh`` the attention/write run head-parallel over the model axis.

    With ``paged_write=True`` (page-aligned first_positions, T a multiple
    of the page size) this doubles as the CHUNKED-PREFILL step: prefix-
    cached requests push only their uncached suffix through the model
    while attending the shared prefix pages.

    The LIST caches form supports per-layer local/global windows
    (cfg.layer_window); the stacked scan requires a uniform window."""
    n, t = chunk_tokens.shape
    x = params["embed"][chunk_tokens].astype(cfg.dtype)  # [n, T, d]
    pos_t = first_positions[:, None] + jnp.arange(t, dtype=jnp.int32)[None]
    total_lengths = jnp.where(active, first_positions + t, 0)
    compute_dtype = (
        jnp.float32 if cfg.attn_tile_dtype is None else jnp.bfloat16
    )
    step = functools.partial(
        _chunk_layer,
        pos_t=pos_t, first_positions=first_positions,
        total_lengths=total_lengths, active=active,
        cfg=cfg, interpret=interpret, compute_dtype=compute_dtype,
        paged_write=paged_write, mesh=mesh,
    )
    if isinstance(caches, KVPages):
        _check_uniform_window(cfg)

        def body(x, xs):
            layer, pages = xs
            return step(x, layer, pages, page_table=page_table,
                        window=cfg.attn_window, sinks=cfg.attn_sinks)

        x, new_caches = lax.scan(body, x, (params["layers"], caches))
    else:
        new_caches = []
        for i, (layer, pages) in enumerate(zip(params["layers"], caches)):
            w = cfg.layer_window(i)
            x, pages = step(x, layer, pages,
                            page_table=_table_for(page_table, i), window=w,
                            sinks=cfg.attn_sinks if w is not None else 0)
            new_caches.append(pages)
    x = rms_norm(x, params["final_norm"])
    logits = dense(x, params["lm_head"]).astype(jnp.float32)
    return logits, new_caches


def _check_uniform_window(cfg: TransformerConfig) -> None:
    """The serving path scans ONE homogeneous layer body over stacked
    params, so a per-layer local/global interleave (global_every > 0) is
    not expressible here — every layer must share cfg.attn_window."""
    if cfg.attn_sinks and cfg.attn_window is None:
        raise ValueError("attn_sinks require attn_window")
    if cfg.attn_window is not None and cfg.global_every > 0:
        raise NotImplementedError(
            "the decode/prefill serving path supports only a uniform "
            "attn_window (global_every must be 0)"
        )


def decode_step(
    params,
    tokens,      # [num_seqs] int32 — last sampled token per slot
    positions,   # [num_seqs] int32 — write position (= current length)
    caches,      # stacked KVPages (scan path) or list[KVPages] (loop path)
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
    axis (decode/sharded.py) and dense projections partition under pjit.
    The LIST caches form supports per-layer local/global windows
    (cfg.layer_window); the stacked scan requires a uniform window."""
    # Gather THEN convert: casting the whole [vocab, d] table costs a
    # full-table HBM pass per step (profiled 0.3 ms at vocab 32k).
    x = params["embed"][tokens].astype(cfg.dtype)  # [n, d_model]
    pos2 = positions[:, None]  # [n, 1] for rope's [B, S] contract
    attn_lengths = jnp.where(active, positions + 1, 0)
    compute_dtype = (
        jnp.float32 if cfg.attn_tile_dtype is None else jnp.bfloat16
    )
    step = functools.partial(
        _decode_layer,
        pos2=pos2, positions=positions, attn_lengths=attn_lengths,
        active=active, cfg=cfg, mesh=mesh,
        interpret=interpret, compute_dtype=compute_dtype,
    )
    if isinstance(caches, KVPages):  # stacked scan path
        _check_uniform_window(cfg)

        def body(x, xs):
            layer, pages = xs
            return step(x, layer, pages, page_table=page_table,
                        window=cfg.attn_window, sinks=cfg.attn_sinks)

        x, new_caches = lax.scan(body, x, (params["layers"], caches))
    else:
        new_caches = []
        for i, (layer, pages) in enumerate(zip(params["layers"], caches)):
            w = cfg.layer_window(i)
            x, pages = step(x, layer, pages,
                            page_table=_table_for(page_table, i), window=w,
                            sinks=cfg.attn_sinks if w is not None else 0)
            new_caches.append(pages)
    x = rms_norm(x, params["final_norm"])
    logits = dense(x, params["lm_head"]).astype(jnp.float32)
    return logits, new_caches
