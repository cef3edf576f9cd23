"""Chunked prefill (Sarathi/vLLM-style): long prompts advance one bounded
chunk per engine step instead of one monolithic prefill forward, so
ongoing decodes keep emitting a token every step.

Parity tests run in fp32: the one-shot path prefills through the training
FA2 kernel while the chunked path goes through verify_step's chunked
attention — different compiled programs, so bf16 logit ties could break
differently (same convention as the speculative-decoding tests).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.decode import DecodeEngine
from cuda_flash_attention_tpu.models import TransformerConfig, init_params

PAGE = 128


def _fp32():
    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None,
    )
    return cfg, init_params(jax.random.PRNGKey(0), cfg)


def _engine(cfg, params, **kw):
    return DecodeEngine(
        params, cfg, max_seqs=2, max_seq_len=512, page_size=PAGE,
        cache_dtype=jnp.float32, **kw,
    )


def _prompt(n, seed=3):
    return np.asarray(
        jax.random.randint(jax.random.PRNGKey(seed), (n,), 0, 256)
    ).tolist()


def test_chunked_prefill_matches_one_shot():
    cfg, params = _fp32()
    prompt = _prompt(300)
    base = _engine(cfg, params).run([prompt], max_new_tokens=6)[0].generated

    eng = _engine(cfg, params, prefill_chunk=128)
    r = eng.run([prompt], max_new_tokens=6)[0]
    assert r.done and r.generated == base
    assert eng.stats["prefill_chunks"] >= 3  # 300 tokens / 128-chunks
    assert eng.allocator.available == eng.allocator.num_pages - 1


def test_short_prompts_skip_chunking():
    cfg, params = _fp32()
    prompt = _prompt(50)
    base = _engine(cfg, params).run([prompt], max_new_tokens=4)[0].generated
    eng = _engine(cfg, params, prefill_chunk=128)
    r = eng.run([prompt], max_new_tokens=4)[0]
    assert r.generated == base
    assert eng.stats["prefill_chunks"] == 0


def test_decode_continues_during_chunked_prefill():
    """The defining property: a decoding request emits a token on every
    step WHILE a long prompt is still prefilling chunk by chunk."""
    cfg, params = _fp32()
    eng = _engine(cfg, params, prefill_chunk=128)
    short = eng.submit(_prompt(8, seed=1), max_new_tokens=20)
    eng.step()  # short is decoding now
    n0 = len(short.generated)
    long_req = eng.submit(_prompt(400, seed=2), max_new_tokens=4)
    assert bool(eng.prefilling[long_req.slot])
    grew = 0
    while eng.prefilling.any():
        before = len(short.generated)
        eng.step()
        grew += len(short.generated) > before
    assert grew >= 2  # short kept decoding through >= 2 prefill chunks
    while any(not r.done for r in (short, long_req)):
        eng.step()
    assert len(long_req.generated) == 4
    assert len(short.generated) == 20
    assert n0 >= 1


def test_chunked_prefill_with_window_recycles():
    """Sliding-window serving: pages entirely behind the window are freed
    BETWEEN chunks, and the output still matches the one-shot windowed
    engine."""
    cfg, params = _fp32()
    wcfg = dataclasses.replace(cfg, attn_window=128, global_every=0)
    prompt = _prompt(400)
    base = _engine(wcfg, params).run([prompt], max_new_tokens=4)[0].generated

    eng = _engine(wcfg, params, prefill_chunk=128)
    r = eng.run([prompt], max_new_tokens=4)[0]
    assert r.generated == base
    assert eng.allocator.available == eng.allocator.num_pages - 1


def test_chunked_prefill_max_new_one_stops_at_prefill():
    """A request whose budget is exhausted by the prefill-completion token
    must NOT ride the same step's decode dispatch (off-by-one regression:
    max_new_tokens=1 generated 2 tokens)."""
    cfg, params = _fp32()
    eng = _engine(cfg, params, prefill_chunk=128)
    r = eng.run([_prompt(300)], max_new_tokens=1)[0]
    assert r.done and len(r.generated) == 1
    assert eng.allocator.available == eng.allocator.num_pages - 1


def test_chunked_prefill_table_not_aliased():
    """Regression: the chunk step must snapshot the page table (jnp.array
    copy).  jnp.asarray can alias the live numpy buffer on CPU, and
    _recycle_stale mutates it before the UNSYNCED intermediate chunk
    computations drain — observed as process-dependent wrong logits in the
    windowed path.  Repeated windowed runs must be bit-identical and match
    the one-shot engine."""
    cfg, params = _fp32()
    wcfg = dataclasses.replace(cfg, attn_window=128, global_every=0)
    prompt = _prompt(400)
    base = _engine(wcfg, params).run([prompt], max_new_tokens=4)[0].generated
    for _ in range(3):
        eng = _engine(wcfg, params, prefill_chunk=128)
        got = eng.run([prompt], max_new_tokens=4)[0].generated
        assert got == base, (got, base)


def test_chunked_prefill_validation():
    cfg, params = _fp32()
    with pytest.raises(ValueError, match="prefill_chunk"):
        _engine(cfg, params, prefill_chunk=100)


def test_prefix_hit_long_suffix_routes_through_chunks():
    """prefix_cache + prefill_chunk: a hit whose UNCACHED suffix exceeds
    the chunk must prefill chunk-by-chunk from the shared pages (a
    one-shot suffix forward would blow the chunk-relaxed admission
    reservation) — with parity against the plain engine."""
    cfg, params = _fp32()
    rng = np.random.default_rng(5)
    prefix = [int(t) for t in rng.integers(0, 200, size=128)]
    long_a = prefix + [int(t) for t in rng.integers(0, 200, size=300)]

    base = _engine(cfg, params).run([long_a], max_new_tokens=4)[0].generated

    eng = _engine(cfg, params, prefix_cache=True, prefill_chunk=128)
    # Seed the prefix cache with a short request sharing the head page.
    eng.run([prefix + [7, 8]], max_new_tokens=2)
    chunks_before = eng.stats["prefill_chunks"]
    r = eng.run([long_a], max_new_tokens=4)[0]
    assert r.generated == base, (r.generated, base)
    assert eng.stats["prefill_chunks"] > chunks_before  # suffix chunked
    assert eng.allocator.available == eng.allocator.num_pages - 1


def test_chunked_prefill_with_speculation():
    """Chunked prefill + speculative decoding: the draft cache mirrors
    every prompt chunk, so the combined engine reproduces the plain
    greedy stream."""
    cfg, params = _fp32()
    prompt = _prompt(300)
    base = _engine(cfg, params).run([prompt], max_new_tokens=6)[0].generated

    draft_cfg = dataclasses.replace(cfg, n_layers=1)
    draft_params = init_params(jax.random.PRNGKey(9), draft_cfg)
    eng = _engine(cfg, params, prefill_chunk=128, spec_tokens=3,
                  draft_params=draft_params, draft_cfg=draft_cfg)
    r = eng.run([prompt], max_new_tokens=6)[0]
    assert r.generated == base, (r.generated, base)
    assert eng.stats["prefill_chunks"] >= 3
    assert eng.stats["spec_rounds"] > 0
    assert eng.allocator.available == eng.allocator.num_pages - 1
