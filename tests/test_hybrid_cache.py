"""Hybrid KV cache (Gemma-2-style): under a local/global window interleave
each WINDOW GROUP owns its page table + allocator, so local layers keep
recycling pages behind their window during generation while global layers
retain full history — per-sequence cache memory for the local half is
window-bounded, not generation-bounded.

Parity runs in fp32 (spec-test tie convention)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.decode import DecodeEngine
from cuda_flash_attention_tpu.models import (
    TransformerConfig,
    forward,
    init_params,
)

PAGE = 128


def _interleave_cfg(window=128, n_layers=2):
    return dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None,
        n_layers=n_layers, attn_window=window, global_every=2,
    )


def _prompt(n, seed=3):
    return np.asarray(
        jax.random.randint(jax.random.PRNGKey(seed), (n,), 0, 256)
    ).tolist()


def test_hybrid_groups_formed():
    cfg = _interleave_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = DecodeEngine(params, cfg, max_seqs=1, max_seq_len=512,
                       page_size=PAGE, cache_dtype=jnp.float32)
    assert eng.n_groups == 2
    assert eng._group_windows == [128, None]
    assert eng._layer_group == [0, 1]
    assert len(eng._tables) == 2 and eng._tables[0] is eng.page_table


def test_hybrid_local_group_recycles_global_keeps():
    """During a long generation the LOCAL group's pages are freed behind
    the window while the GLOBAL group holds every page."""
    cfg = _interleave_cfg(window=128)
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = DecodeEngine(params, cfg, max_seqs=1, max_seq_len=1024,
                       page_size=PAGE, cache_dtype=jnp.float32)
    prompt = _prompt(300)
    req = eng.submit(prompt, max_new_tokens=400)
    while not req.done:
        eng.step()
    # Request still occupied its slot right before the last retire; easier:
    # run a fresh one and inspect mid-generation.
    eng.step()  # retire

    req = eng.submit(prompt, max_new_tokens=400)
    for _ in range(350):
        eng.step()
        if req.done:
            break
    assert not req.done  # still generating at ~350 tokens
    slot = req.slot
    local_live = sum(1 for p in eng._slot_pages[slot][0] if p is not None)
    global_live = sum(1 for p in eng._slot_pages[slot][1] if p is not None)
    # Local group: bounded by window pages (+1 straddle), NOT by length.
    assert local_live <= 128 // PAGE + 1
    # Global group: every page of the ~650-token history is held.
    assert global_live >= 5
    while not req.done:
        eng.step()
    eng.step()
    # Both groups drain fully back to their own allocators.
    for g in range(eng.n_groups):
        a = eng._galloc(0, g)
        assert a.available == a.num_pages - 1


def test_hybrid_greedy_matches_full_forward():
    cfg = _interleave_cfg(window=64)
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = DecodeEngine(params, cfg, max_seqs=2, max_seq_len=512,
                       page_size=PAGE, cache_dtype=jnp.float32)
    prompt = _prompt(200)
    req = eng.run([prompt], max_new_tokens=6)[0]

    toks = list(prompt)
    full = []
    for _ in range(6):
        logits = forward(params, jnp.asarray([toks], jnp.int32), cfg)
        nxt = int(jnp.argmax(logits[0, -1]))
        full.append(nxt)
        toks.append(nxt)
    assert req.generated == full, (req.generated, full)


@pytest.mark.slow
def test_hybrid_chunked_prefill_bounded_local_pages():
    """Chunked prefill + hybrid: the local group's pool can be SMALLER than
    the prompt needs (lazy per-chunk allocation + recycling between
    chunks), and the output still matches the one-shot hybrid engine."""
    cfg = _interleave_cfg(window=128, n_layers=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    prompt = _prompt(640)
    base = DecodeEngine(
        params, cfg, max_seqs=1, max_seq_len=1024, page_size=PAGE,
        cache_dtype=jnp.float32,
    ).run([prompt], max_new_tokens=4)[0].generated

    eng = DecodeEngine(params, cfg, max_seqs=1, max_seq_len=1024,
                       page_size=PAGE, cache_dtype=jnp.float32,
                       prefill_chunk=128)
    peak_local = 0

    orig = eng._chunk_prefill_step
    def spy():
        nonlocal peak_local
        orig()
        for s in range(eng.max_seqs):
            peak_local = max(
                peak_local,
                sum(1 for p in eng._slot_pages[s][0] if p is not None),
            )
    eng._chunk_prefill_step = spy
    r = eng.run([prompt], max_new_tokens=4)[0]
    assert r.generated == base, (r.generated, base)
    # 640-token prompt = 5 pages, but the local group never held more than
    # chunk+window+straddle pages concurrently.
    assert peak_local <= 3, peak_local


def test_hybrid_rejects_unwired_compositions():
    cfg = _interleave_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(NotImplementedError, match="hybrid"):
        DecodeEngine(params, cfg, max_seqs=1, max_seq_len=256,
                     page_size=PAGE, prefix_cache=True)
    with pytest.raises(NotImplementedError, match="hybrid"):
        DecodeEngine(params, cfg, max_seqs=1, max_seq_len=256,
                     page_size=PAGE, spec_tokens=2,
                     draft_params=params, draft_cfg=cfg)
