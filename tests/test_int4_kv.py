"""INT4 paged KV cache: split-half nibble packing (stored width D/2; the
kernel restores exact element order with two integer ops + one
lane-concat), per-token scales at qmax 7 — 2x the tokens per HBM byte vs
int8 (8x vs fp32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.decode import (
    DecodeEngine,
    PageAllocator,
    append_token_kv,
    init_kv_pages,
    paged_decode_attention,
    write_prompt_kv,
)
from cuda_flash_attention_tpu.kernels.common import kv_storage_cast
from cuda_flash_attention_tpu.models import TransformerConfig, init_params
from cuda_flash_attention_tpu.ops.reference import vanilla_attention

PAGE = 128


def _dense_from_pages(pages, page_table, length, slot, head_dim=64):
    """Rebuild a slot's dense [Hkv, length, D] K/V — unpacking int4 via the
    same kv_storage_cast the kernel uses (it is plain jnp outside Pallas).
    Packing is inferred the way the product code does: pages width vs the
    KNOWN head_dim (a plain int8 cache passes straight through)."""
    hkv = pages.k_pages.shape[0]
    n_pages = -(-length // PAGE)
    ks, vs = [], []
    for p in range(n_pages):
        pid = int(page_table[slot, p])
        k = kv_storage_cast(pages.k_pages[:, pid], head_dim, jnp.float32)
        v = kv_storage_cast(pages.v_pages[:, pid], head_dim, jnp.float32)
        ks.append(k * pages.k_scales[:, pid][..., None])
        vs.append(v * pages.v_scales[:, pid][..., None])
    return (
        jnp.concatenate(ks, axis=1)[:, :length],
        jnp.concatenate(vs, axis=1)[:, :length],
    )


def test_int4_pages_round_trip_quality():
    """Write -> dequantize: per-element error bounded by scale/2 (4-bit
    budget) and the packing is order-exact."""
    hkv, d, length = 2, 64, 200
    pages = init_kv_pages(hkv, 16, PAGE, d, "int4")
    assert pages.k_pages.shape[-1] == d // 2  # packed width
    alloc = PageAllocator(16)
    ids = alloc.alloc(2)
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((2 * PAGE, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2 * PAGE, hkv, d)), jnp.float32)
    pages = write_prompt_kv(pages, k, v, jnp.asarray(ids, jnp.int32))
    table = np.zeros((1, 4), np.int32)
    table[0, :2] = ids
    kd, vd = _dense_from_pages(pages, table, length, 0)
    k_ref = k[:length].transpose(1, 0, 2)
    # Per-row bound: amax/14 (scale = amax/7, rounding error <= scale/2).
    bound = jnp.max(jnp.abs(k_ref), axis=-1, keepdims=True) / 14.0 + 1e-6
    assert bool(jnp.all(jnp.abs(kd - k_ref) <= bound))


@pytest.mark.parametrize("window", [None, 96])
def test_int4_paged_decode_matches_dequant_oracle(window):
    """The decode kernel over int4 pages == dense attention over the
    DEQUANTIZED cache (kernel exactness; quantization error lives only in
    the storage round trip)."""
    hkv, d = 2, 64
    lengths = (200, 77)
    pages = init_kv_pages(hkv, 16, PAGE, d, "int4")
    alloc = PageAllocator(16)
    table = np.zeros((len(lengths), 4), np.int32)
    rng = np.random.default_rng(0)
    for s, length in enumerate(lengths):
        n = -(-length // PAGE)
        ids = alloc.alloc(n)
        table[s, :n] = ids
        k = jnp.asarray(rng.standard_normal((n * PAGE, hkv, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((n * PAGE, hkv, d)), jnp.float32)
        pages = write_prompt_kv(pages, k, v, jnp.asarray(ids, jnp.int32))
    q = jnp.asarray(rng.standard_normal((len(lengths), hkv * 2, d)),
                    jnp.float32)

    o = paged_decode_attention(
        q, pages, jnp.asarray(table), jnp.asarray(lengths, jnp.int32),
        compute_dtype=jnp.float32, window=window, interpret=True,
    )
    for s, length in enumerate(lengths):
        kd, vd = _dense_from_pages(pages, table, length, s)
        lo = max(0, length - window) if window is not None else 0
        kk = jnp.repeat(kd[:, lo:length], 2, axis=0)[None]
        vv = jnp.repeat(vd[:, lo:length], 2, axis=0)[None]
        o_ref = vanilla_attention(
            q[s][None, :, None, :], kk, vv, causal=False
        )[0, :, 0]
        err = float(jnp.abs(o[s] - o_ref).max())
        assert err < 2e-5, (s, err)


def test_int4_append_and_engine_end_to_end():
    """Decode appends land in packed pages, and the full engine generates
    over an int4 cache (incl. speculative verification chunks)."""
    hkv, d = 2, 64
    pages = init_kv_pages(hkv, 8, PAGE, d, "int4")
    table = jnp.zeros((1, 4), jnp.int32).at[0, 0].set(1)
    k1 = jnp.asarray(np.random.default_rng(1).standard_normal((1, hkv, d)),
                     jnp.float32)
    v1 = k1 + 1.0
    pages = append_token_kv(pages, k1, v1, table, jnp.asarray([0]),
                            jnp.asarray([True]))
    kd, vd = _dense_from_pages(pages, np.asarray(table), 1, 0)
    bound = jnp.max(jnp.abs(k1[0]), axis=-1, keepdims=True) / 14.0 + 1e-6
    assert bool(jnp.all(jnp.abs(kd[:, 0] - k1[0]) <= bound))

    cfg = TransformerConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = DecodeEngine(params, cfg, max_seqs=2, max_seq_len=256,
                       cache_dtype="int4")
    reqs = eng.run([[1, 2, 3], [4, 5]], max_new_tokens=4)
    assert all(r.done and len(r.generated) == 4 for r in reqs)
    assert all(0 <= t < cfg.vocab_size for r in reqs for t in r.generated)
    assert eng.allocator.available == eng.allocator.num_pages - 1

    # int4 cache quality: greedy stream tracks the fp32-cache stream for
    # at least the first tokens on a tiny model.
    ref = DecodeEngine(params, cfg, max_seqs=2, max_seq_len=256,
                       cache_dtype=jnp.float32).run(
        [[1, 2, 3]], max_new_tokens=4)[0].generated
    got = DecodeEngine(params, cfg, max_seqs=2, max_seq_len=256,
                       cache_dtype="int4").run(
        [[1, 2, 3]], max_new_tokens=4)[0].generated
    assert got[0] == ref[0], (got, ref)


def test_int4_speculative_verify_chunks():
    """Prompt-lookup speculation over an int4 cache: the chunked verify
    kernel reads packed pages too."""
    cfg = TransformerConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = DecodeEngine(params, cfg, max_seqs=1, max_seq_len=256,
                       cache_dtype="int4", spec_tokens=2,
                       spec_mode="prompt_lookup")
    r = eng.run([[5, 7, 11] * 6], max_new_tokens=6)[0]
    assert r.done and len(r.generated) == 6
    assert eng.stats["spec_rounds"] > 0


@pytest.mark.slow
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="on-chip Mosaic compile smoke "
                           "(CFA_TEST_PLATFORM=tpu to enable)")
def test_int4_storage_cast_compiles_on_chip():
    """The nibble unpack must legalize in Mosaic (round-3 failure:
    8-bit arith.subi; now i32 shift pairs) — compiled decode over int4
    pages matches the dequant oracle on the real chip."""
    hkv, d = 2, 64
    pages = init_kv_pages(hkv, 4, PAGE, d, "int4")
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((PAGE, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((PAGE, hkv, d)), jnp.float32)
    pages = write_prompt_kv(pages, k, v, jnp.asarray([1], jnp.int32))
    q = jnp.asarray(rng.standard_normal((1, hkv * 2, d)), jnp.float32)
    table = jnp.asarray([[1, 0]], jnp.int32)
    o = paged_decode_attention(q, pages, table,
                               jnp.asarray([100], jnp.int32),
                               compute_dtype=jnp.float32)  # interpret=None -> compiled
    kd, vd = _dense_from_pages(pages, np.asarray(table), 100, 0)
    kk = jnp.repeat(kd, 2, axis=0)[None]
    vv = jnp.repeat(vd, 2, axis=0)[None]
    o_ref = vanilla_attention(q[0][None, :, None, :], kk, vv,
                              causal=False)[0, :, 0]
    assert float(jnp.abs(o[0] - o_ref).max()) < 2e-5
