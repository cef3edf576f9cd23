"""Chunked (multi-query) paged attention — the speculative-decoding
verification primitive: T consecutive queries per sequence attend the paged
cache their own K/V was just appended to, each causally up to its own
position.  Oracle: dense per-query attention over the slot's prefix."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.decode import (
    PageAllocator,
    append_chunk_kv,
    init_kv_pages,
    paged_chunk_attention,
    paged_decode_attention,
    write_prompt_kv,
)
from cuda_flash_attention_tpu.ops.reference import vanilla_attention

PAGE = 128


def _build(lengths_base, chunk, hkv=2, group=2, d=64, dtype=jnp.float32,
           seed=0):
    """Paged cache holding `base + chunk` tokens per slot (chunk appended
    via append_chunk_kv), plus the dense K/V mirror for the oracle."""
    rng = np.random.default_rng(seed)
    num_seqs = len(lengths_base)
    pages = init_kv_pages(hkv, 16, PAGE, d, dtype)
    page_table = np.zeros((num_seqs, 4), np.int32)
    alloc = PageAllocator(16)
    dense = []
    for s, L in enumerate(lengths_base):
        n = -(-(L + chunk) // PAGE)  # room for the chunk too
        ids = alloc.alloc(n)
        page_table[s, :n] = ids
        pad = n * PAGE
        k = jnp.asarray(rng.standard_normal((pad, hkv, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((pad, hkv, d)), jnp.float32)
        # write_prompt_kv fills whole pages; positions >= L are garbage that
        # must never be attended (mask check) until the chunk overwrites them.
        pages = write_prompt_kv(pages, k, v, jnp.asarray(ids, jnp.int32))
        dense.append([k[:L], v[:L]])

    k_chunk = jnp.asarray(
        rng.standard_normal((num_seqs, chunk, hkv, d)), jnp.float32
    )
    v_chunk = jnp.asarray(
        rng.standard_normal((num_seqs, chunk, hkv, d)), jnp.float32
    )
    pages = append_chunk_kv(
        pages, k_chunk, v_chunk, jnp.asarray(page_table),
        jnp.asarray(lengths_base, jnp.int32),
        jnp.asarray([True] * num_seqs),
    )
    for s in range(num_seqs):
        dense[s][0] = jnp.concatenate([dense[s][0], k_chunk[s]], axis=0)
        dense[s][1] = jnp.concatenate([dense[s][1], v_chunk[s]], axis=0)
    q = jnp.asarray(
        rng.standard_normal((num_seqs, chunk, hkv * group, d)), jnp.float32
    )
    totals = [L + chunk for L in lengths_base]
    return q, pages, page_table, totals, dense


def _oracle_rows(q_s, k, v, total, chunk, window=None):
    """Dense oracle: query t (position total-chunk+t) over its causal
    (optionally windowed) prefix."""
    group = q_s.shape[1] // k.shape[1]
    kk = jnp.repeat(k.transpose(1, 0, 2), group, axis=0)
    vv = jnp.repeat(v.transpose(1, 0, 2), group, axis=0)
    outs = []
    for t in range(chunk):
        pos = total - chunk + t
        lo = 0 if window is None else max(0, pos - window + 1)
        outs.append(vanilla_attention(
            q_s[t][None, :, None, :], kk[None, :, lo:pos + 1],
            vv[None, :, lo:pos + 1], causal=False,
        )[0, :, 0])
    return jnp.stack(outs)  # [chunk, Hq, D]


@pytest.mark.quick
@pytest.mark.parametrize("chunk", [1, 4])
def test_chunk_attention_matches_oracle(chunk):
    bases = [200, 126, 77]  # 126+chunk crosses a page boundary at chunk>=3
    q, pages, page_table, totals, dense = _build(bases, chunk)
    o = paged_chunk_attention(
        q, pages, jnp.asarray(page_table), jnp.asarray(totals, jnp.int32),
        compute_dtype=jnp.float32,
    )
    for s in range(len(bases)):
        k, v = dense[s]
        o_ref = _oracle_rows(q[s], k, v, totals[s], chunk)
        err = float(jnp.max(jnp.abs(o[s] - o_ref)))
        assert err < 1e-5, f"slot {s}: {err}"


def test_chunk_attention_windowed():
    bases = [250]
    chunk = 4
    q, pages, page_table, totals, dense = _build(bases, chunk)
    o = paged_chunk_attention(
        q, pages, jnp.asarray(page_table), jnp.asarray(totals, jnp.int32),
        compute_dtype=jnp.float32, window=96,
    )
    k, v = dense[0]
    o_ref = _oracle_rows(q[0], k, v, totals[0], chunk, window=96)
    err = float(jnp.max(jnp.abs(o[0] - o_ref)))
    assert err < 1e-5, err


def test_chunk_of_one_equals_decode_kernel():
    """T=1 chunk must agree with the single-query decode kernel."""
    bases = [200, 77]
    q, pages, page_table, totals, dense = _build(bases, 1)
    o_chunk = paged_chunk_attention(
        q, pages, jnp.asarray(page_table), jnp.asarray(totals, jnp.int32),
        compute_dtype=jnp.float32,
    )
    o_dec = paged_decode_attention(
        q[:, 0], pages, jnp.asarray(page_table),
        jnp.asarray(totals, jnp.int32), compute_dtype=jnp.float32,
    )
    err = float(jnp.max(jnp.abs(o_chunk[:, 0] - o_dec)))
    assert err < 1e-6, err


def test_chunk_attention_int8_cache():
    bases = [150]
    chunk = 3
    q, pages, page_table, totals, dense = _build(
        bases, chunk, dtype=jnp.int8
    )
    o = paged_chunk_attention(
        q, pages, jnp.asarray(page_table), jnp.asarray(totals, jnp.int32),
        compute_dtype=jnp.float32,
    )
    # Oracle over the round-tripped cache would need a dequant mirror; the
    # fp32 dense mirror bounds the combined kernel+quantization error.
    k, v = dense[0]
    o_ref = _oracle_rows(q[0], k, v, totals[0], chunk)
    err = float(jnp.max(jnp.abs(o[0] - o_ref)))
    assert err < 5e-2, err


def test_chunk_append_crosses_page_boundary():
    """append_chunk_kv spanning two pages lands every token at the right
    (page, offset)."""
    hkv, d = 1, 64
    pages = init_kv_pages(hkv, 6, PAGE, d, jnp.float32)
    page_table = np.zeros((1, 3), np.int32)
    page_table[0, :2] = [2, 4]
    base = PAGE - 2  # two tokens left on page 2, rest lands on page 4
    chunk = 5
    k = jnp.arange(chunk * d, dtype=jnp.float32).reshape(1, chunk, 1, d)
    v = -k
    pages = append_chunk_kv(
        pages, k, v, jnp.asarray(page_table),
        jnp.asarray([base], jnp.int32), jnp.asarray([True]),
    )
    got = []
    for i in range(chunk):
        pos = base + i
        pid = page_table[0, pos // PAGE]
        got.append(np.asarray(pages.k_pages[0, pid, pos % PAGE]))
    np.testing.assert_allclose(
        np.stack(got), np.asarray(k[0, :, 0]), rtol=0, atol=0
    )
