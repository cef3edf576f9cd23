"""Prefix caching: page-aligned shared prompt prefixes are stored once;
later overlapping requests share the physical pages (refcounted) and push
only their suffix through the model — with token-for-token parity against
the uncached engine.

Parity runs in fp32 (see tests/test_speculative.py: bf16 logit ties break
differently across differently-compiled programs)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.decode import DecodeEngine
from cuda_flash_attention_tpu.models import TransformerConfig, init_params

PAGE = 128


def _cfg_params():
    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None,
    )
    return cfg, init_params(jax.random.PRNGKey(0), cfg)


def _engine(cfg, params, **kw):
    return DecodeEngine(
        params, cfg, max_seqs=2, max_seq_len=512, page_size=PAGE,
        cache_dtype=jnp.float32, **kw,
    )


def _shared_prompts():
    rng = np.random.default_rng(0)
    prefix = [int(t) for t in rng.integers(0, 200, size=2 * PAGE)]
    a = prefix + [11, 12, 13]
    b = prefix + [99, 98]
    return a, b


@pytest.mark.slow
def test_prefix_hit_shares_pages_and_matches_uncached():
    cfg, params = _cfg_params()
    a, b = _shared_prompts()

    eng = _engine(cfg, params, prefix_cache=True)
    eng.submit(a, max_new_tokens=4)
    eng.step()  # admits + prefills A, registering its 2 full prefix pages
    avail_after_a = eng.allocator.available
    eng.submit(b, max_new_tokens=4)
    eng.step()  # admits B via the prefix-hit suffix path
    # B needed only ONE new page (its 1-page padded suffix); the 2 prefix
    # pages are shared, not copied.
    assert avail_after_a - eng.allocator.available == 1
    assert eng.allocator.refcount(eng._slot_pages[0][0][0]) == 2
    reqs = []
    while len(reqs) < 2:
        reqs.extend(eng.step())
    out = {tuple(r.prompt): r.generated for r in reqs}

    # Uncached reference engine: identical generations.
    ref_eng = _engine(cfg, params)
    ref = {tuple(r.prompt): r.generated
           for r in ref_eng.run([a, b], max_new_tokens=4)}
    assert out == ref, (out, ref)


@pytest.mark.slow
def test_prefix_pages_survive_owner_retirement():
    """A retires while B (sharing A's prefix pages) is mid-generation: the
    refcount keeps the pages alive; everything returns to the pool at the
    end and the cache map empties."""
    cfg, params = _cfg_params()
    a, b = _shared_prompts()
    eng = _engine(cfg, params, prefix_cache=True)
    eng.submit(a, max_new_tokens=2)   # A is still active when B admits...
    eng.step()
    eng.submit(b, max_new_tokens=8)   # ...B shares, then outlives, A's pages
    done = []
    for _ in range(16):
        done.extend(eng.step())
        if len(done) == 2:
            break
    assert len(done) == 2 and all(r.done for r in done)
    assert eng.allocator.available == eng.allocator.num_pages - 1
    assert eng._prefix_maps == [{}] and eng._page_keys == [{}]


def test_prefix_miss_paths_still_register():
    """Different first pages -> no hit; both prompts register their own
    prefix entries."""
    cfg, params = _cfg_params()
    eng = _engine(cfg, params, prefix_cache=True)
    rng = np.random.default_rng(1)
    p1 = [int(t) for t in rng.integers(0, 200, size=PAGE + 5)]
    p2 = [int(t) for t in rng.integers(0, 200, size=PAGE + 5)]
    eng.submit(p1, max_new_tokens=2)
    eng.submit(p2, max_new_tokens=2)
    eng.step()
    assert len(eng._prefix_maps[0]) == 2


def test_exact_multiple_prompt_leaves_suffix():
    """A prompt that is an exact page multiple and fully cached must still
    process its last page as suffix (logits need a query position)."""
    cfg, params = _cfg_params()
    eng = _engine(cfg, params, prefix_cache=True)
    rng = np.random.default_rng(2)
    p = [int(t) for t in rng.integers(0, 200, size=2 * PAGE)]
    reqs = []
    eng.submit(p, max_new_tokens=2)
    reqs.extend(eng.step())
    eng.submit(list(p), max_new_tokens=2)
    reqs.extend(eng.step())
    hits = eng._prefix_hits(p, 0)
    assert len(hits) <= 1  # never all pages — one page stays as suffix
    for _ in range(8):
        reqs.extend(eng.step())
        if len(reqs) == 2:
            break
    assert [r.generated for r in reqs][0] == [r.generated for r in reqs][1]


@pytest.mark.slow
def test_prefix_cache_dp_tp_mesh():
    """Prefix caching across DATA shards: each shard keeps its own page
    map (local page ids); generation matches the unsharded uncached
    engine."""
    from cuda_flash_attention_tpu.parallel.mesh import make_device_mesh

    devices = jax.devices("cpu")
    if len(devices) < 4:
        pytest.skip("need 4 cpu devices")
    mesh = make_device_mesh({"data": 2, "model": 2}, devices=devices[:4])
    cfg, params = _cfg_params()
    a, b = _shared_prompts()

    ref_eng = DecodeEngine(params, cfg, max_seqs=4, max_seq_len=512,
                           page_size=PAGE, cache_dtype=jnp.float32,
                           interpret=True)
    ref = {tuple(r.prompt): r.generated
           for r in ref_eng.run([a, b], max_new_tokens=4)}

    eng = DecodeEngine(params, cfg, max_seqs=4, max_seq_len=512,
                       page_size=PAGE, cache_dtype=jnp.float32,
                       mesh=mesh, prefix_cache=True)
    assert len(eng._prefix_maps) == 2  # one map per data shard
    eng.submit(a, max_new_tokens=4)
    eng.step()
    eng.submit(b, max_new_tokens=4)  # same shard (slots 0,1) -> prefix hit
    done = []
    done.extend(eng.step())
    # Both slots live on shard 0 and share the 2 physical prefix pages.
    assert eng._slot_pages[0][0][:2] == eng._slot_pages[1][0][:2]
    for _ in range(16):
        done.extend(eng.step())
        if len(done) == 2:
            break
    out = {tuple(r.prompt): r.generated for r in done}
    assert out == ref, (out, ref)
    for alloc in eng.allocators:
        assert alloc.available == alloc.num_pages - 1
