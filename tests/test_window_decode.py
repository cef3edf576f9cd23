"""Sliding-window serving tests: the windowed paged-decode kernel against a
dense oracle, recycled-page safety, and the engine's rolling KV cache
(pages behind the window return to the pool, so per-sequence HBM — and the
admission budget — is bounded by the window, not the generation length)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.decode import (
    DecodeEngine,
    PageAllocator,
    init_kv_pages,
    paged_decode_attention,
    write_prompt_kv,
)
from cuda_flash_attention_tpu.models import (
    TransformerConfig,
    forward,
    init_params,
)
from cuda_flash_attention_tpu.ops.reference import vanilla_attention

PAGE = 128


def _paged_problem(lengths, hkv=2, d=64, seed=0):
    rng = np.random.default_rng(seed)
    pages = init_kv_pages(hkv, 16, PAGE, d, jnp.float32)
    page_table = np.zeros((len(lengths), 4), np.int32)
    alloc = PageAllocator(16)
    kv_dense = []
    for s, L in enumerate(lengths):
        n = -(-L // PAGE)
        ids = alloc.alloc(n)
        page_table[s, :n] = ids
        pad = n * PAGE
        k = jnp.asarray(rng.standard_normal((pad, hkv, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((pad, hkv, d)), jnp.float32)
        pages = write_prompt_kv(pages, k, v, jnp.asarray(ids, jnp.int32))
        kv_dense.append((k[:L], v[:L]))
    return pages, page_table, kv_dense


def _windowed_oracle(q_row, k, v, window):
    """Dense attention of one query (the last position) over the last
    `window` keys.  q_row [Hq, D]; k/v [L, Hkv, D]."""
    L = k.shape[0]
    lo = max(0, L - window)
    group = q_row.shape[0] // k.shape[1]
    kk = jnp.repeat(k[lo:].transpose(1, 0, 2), group, axis=0)
    vv = jnp.repeat(v[lo:].transpose(1, 0, 2), group, axis=0)
    return vanilla_attention(
        q_row[None, :, None, :], kk[None], vv[None], causal=False
    )[0, :, 0]


@pytest.mark.quick
@pytest.mark.parametrize("window", [64, 128, 300])
def test_windowed_paged_decode_matches_oracle(window):
    lengths = [200, 128, 77]
    hkv, d, group = 2, 64, 2
    pages, page_table, kv_dense = _paged_problem(lengths, hkv, d)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((3, hkv * group, d)), jnp.float32)

    o = paged_decode_attention(
        q, pages, jnp.asarray(page_table), jnp.asarray(lengths, jnp.int32),
        compute_dtype=jnp.float32, window=window,
    )
    for s, L in enumerate(lengths):
        k, v = kv_dense[s]
        o_ref = _windowed_oracle(q[s], k, v, window)
        err = float(jnp.max(jnp.abs(o[s] - o_ref)))
        assert err < 1e-5, f"slot {s}: {err}"


def test_windowed_decode_ignores_recycled_pages():
    """Zeroing the table entry of a fully-stale page (what the engine's
    recycler does) must not change the output: the kernel never reads
    behind the window."""
    lengths = [300]
    pages, page_table, kv_dense = _paged_problem(lengths)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 4, 64)), jnp.float32)
    window = 128  # positions [172, 300) — page 0 (0..127) is fully stale

    args = (jnp.asarray(lengths, jnp.int32),)
    o_full = paged_decode_attention(
        q, pages, jnp.asarray(page_table), *args,
        compute_dtype=jnp.float32, window=window,
    )
    recycled = page_table.copy()
    recycled[0, 0] = 0  # dead logical page -> null physical page
    o_recycled = paged_decode_attention(
        q, pages, jnp.asarray(recycled), *args,
        compute_dtype=jnp.float32, window=window,
    )
    np.testing.assert_array_equal(np.asarray(o_full), np.asarray(o_recycled))


# ---------------------------------------------------------------------------
# Engine: rolling cache + window-aware admission
# ---------------------------------------------------------------------------


def _windowed_engine(window, **kw):
    cfg = dataclasses.replace(TransformerConfig.tiny(), attn_window=window)
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = DecodeEngine(
        params, cfg, max_seqs=1, max_seq_len=512, page_size=PAGE,
        cache_dtype=jnp.bfloat16, **kw,
    )
    return cfg, params, eng


@pytest.mark.slow
def test_engine_rolling_cache_bounded_memory():
    """Generation longer than the physical pool: 256-token prompt + 240 new
    tokens needs 4 concurrent pages unrecycled, but the pool only has 3
    usable — only window-aware admission + stale-page recycling can finish."""
    cfg, params, eng = _windowed_engine(window=128, num_pages=4)
    prompt = list(np.random.default_rng(0).integers(0, 100, size=256))
    reqs = eng.run([prompt], max_new_tokens=240)
    assert reqs[0].done and len(reqs[0].generated) == 240
    # Every page returned to the pool (page 0 is the reserved null page).
    assert eng.allocator.available == eng.allocator.num_pages - 1
    # Live pages never exceeded the window bound (2) + the growth page.
    assert eng._slot_pages[0] == [[]]  # one (empty) list per window group


@pytest.mark.slow
def test_engine_windowed_greedy_matches_full_forward():
    """Greedy decode through the windowed paged path == greedy decode via
    repeated full WINDOWED forwards (token-level parity: the rolling cache
    and page skips must not change the math)."""
    # window=16 < prompt length so the mask is ACTIVE at prefill and on
    # every decode step (not just formally enabled).
    cfg, params, eng = _windowed_engine(window=16)
    prompt = [5, 17, 100, 42] * 8  # 32 tokens
    steps = 5
    req = eng.run([prompt], max_new_tokens=steps)[0]

    toks = list(prompt)
    full = []
    for _ in range(steps):
        logits = forward(params, jnp.asarray([toks], jnp.int32), cfg)
        nxt = int(jnp.argmax(logits[0, -1]))
        full.append(nxt)
        toks.append(nxt)
    assert req.generated == full, f"paged {req.generated} vs full {full}"


def test_engine_interleave_greedy_matches_full_forward():
    """Local/global window interleave (global_every — Gemma-2 style)
    serves through the per-layer LIST path: greedy decode must match
    repeated full forwards (which natively interleave windows).  Page
    recycling is disabled (the global layers pin history), but local
    layers still window their attention."""
    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None,
        attn_window=16, global_every=2,
    )
    assert cfg.layer_window(0) == 16 and cfg.layer_window(1) is None
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = DecodeEngine(params, cfg, max_seqs=1, max_seq_len=512,
                       page_size=PAGE, cache_dtype=jnp.float32)
    assert not eng._scanned  # interleave forces the per-layer list path
    assert eng.window is None  # global layers pin history: no recycling
    prompt = [5, 17, 100, 42] * 8  # 32 tokens > window
    steps = 5
    req = eng.run([prompt], max_new_tokens=steps)[0]

    toks = list(prompt)
    full = []
    for _ in range(steps):
        logits = forward(params, jnp.asarray([toks], jnp.int32), cfg)
        nxt = int(jnp.argmax(logits[0, -1]))
        full.append(nxt)
        toks.append(nxt)
    assert req.generated == full, f"paged {req.generated} vs full {full}"


def test_engine_interleave_chunked_prefill_matches():
    """Interleaved windows + chunked prefill: the per-layer chunk path
    must reproduce the one-shot interleaved engine."""
    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None,
        attn_window=64, global_every=2,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    prompt = list(np.random.default_rng(3).integers(0, 200, size=300))
    base = DecodeEngine(
        params, cfg, max_seqs=1, max_seq_len=512, page_size=PAGE,
        cache_dtype=jnp.float32,
    ).run([prompt], max_new_tokens=4)[0].generated
    eng = DecodeEngine(params, cfg, max_seqs=1, max_seq_len=512,
                       page_size=PAGE, cache_dtype=jnp.float32,
                       prefill_chunk=128)
    r = eng.run([prompt], max_new_tokens=4)[0]
    assert r.generated == base, (r.generated, base)
