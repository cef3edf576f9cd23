"""Decode-engine tests: paged cache writes, flash-decoding kernel vs the
dense oracle, continuous batching, and end-to-end generation parity between
the paged decode path and a full (non-cached) forward.
"""

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
from cuda_flash_attention_tpu.models import TransformerConfig, forward, init_params
from cuda_flash_attention_tpu.ops.reference import vanilla_attention

PAGE = 128


def _dequant_cache(pages, page_table, length, slot, n_kv_heads, head_dim):
    """Rebuild a slot's dense [Hkv, length, D] K/V from the paged cache."""
    n_pages = -(-length // PAGE)
    ks, vs = [], []
    for p in range(n_pages):
        pid = int(page_table[slot, p])
        k = np.asarray(pages.k_pages[:, pid].astype(jnp.float32)) \
            * np.asarray(pages.k_scales[:, pid])[..., None]
        v = np.asarray(pages.v_pages[:, pid].astype(jnp.float32)) \
            * np.asarray(pages.v_scales[:, pid])[..., None]
        ks.append(k)
        vs.append(v)
    k = np.concatenate(ks, axis=1)[:, :length]
    v = np.concatenate(vs, axis=1)[:, :length]
    return k, v


# ---------------------------------------------------------------------------
# Cache primitives
# ---------------------------------------------------------------------------


@pytest.mark.quick
def test_page_allocator_reuse():
    alloc = PageAllocator(8)
    a = alloc.alloc(3)
    assert len(set(a)) == 3 and 0 not in a
    alloc.free(a)
    b = alloc.alloc(7)
    assert len(set(b)) == 7 and 0 not in b
    with pytest.raises(MemoryError):
        alloc.alloc(1)


@pytest.mark.parametrize("dtype", [
    pytest.param(jnp.int8, marks=pytest.mark.slow),
    jnp.bfloat16,
    jnp.float32,
])
def test_write_then_append_roundtrip(dtype):
    hkv, d = 2, 64
    pages = init_kv_pages(hkv, num_pages=6, page_size=PAGE, head_dim=d, dtype=dtype)
    prompt_len = PAGE  # one full page
    k = jax.random.normal(jax.random.PRNGKey(0), (prompt_len, hkv, d))
    v = jax.random.normal(jax.random.PRNGKey(1), (prompt_len, hkv, d))
    pages = write_prompt_kv(pages, k, v, jnp.asarray([3], jnp.int32))

    page_table = np.zeros((1, 4), np.int32)
    page_table[0, 0] = 3
    page_table[0, 1] = 2
    # Append one token at position PAGE (first slot of page 2).
    k1 = jax.random.normal(jax.random.PRNGKey(2), (1, hkv, d))
    v1 = jax.random.normal(jax.random.PRNGKey(3), (1, hkv, d))
    pages = append_token_kv(
        pages, k1, v1, jnp.asarray(page_table),
        jnp.asarray([PAGE], jnp.int32), jnp.asarray([True]),
    )
    k_got, v_got = _dequant_cache(pages, page_table, PAGE + 1, 0, hkv, d)
    k_want = np.concatenate([np.asarray(k).transpose(1, 0, 2),
                             np.asarray(k1).transpose(1, 0, 2)], axis=1)
    v_want = np.concatenate([np.asarray(v).transpose(1, 0, 2),
                             np.asarray(v1).transpose(1, 0, 2)], axis=1)
    tol = 0.05 if dtype == jnp.int8 else (0.02 if dtype == jnp.bfloat16 else 1e-6)
    assert np.max(np.abs(k_got - k_want)) < tol
    assert np.max(np.abs(v_got - v_want)) < tol


@pytest.mark.slow
def test_append_inactive_slot_is_noop():
    hkv, d = 1, 64
    pages = init_kv_pages(hkv, 4, PAGE, d, jnp.float32)
    page_table = jnp.asarray([[1, 0], [2, 0]], jnp.int32)
    k = jnp.ones((2, hkv, d))
    v = jnp.ones((2, hkv, d))
    before = np.asarray(pages.k_pages)
    pages2 = append_token_kv(
        pages, k, v, page_table, jnp.asarray([0, 0], jnp.int32),
        jnp.asarray([True, False]),
    )
    after = np.asarray(pages2.k_pages)
    assert np.any(after[:, 1] != before[:, 1])   # active slot wrote
    np.testing.assert_array_equal(after[:, 2], before[:, 2])  # inactive didn't


# ---------------------------------------------------------------------------
# Paged decode attention kernel vs dense oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dtype,tol", [
    (jnp.float32, 2e-5), (jnp.int8, 0.05),
])
@pytest.mark.parametrize("group", [pytest.param(1, marks=pytest.mark.slow), 4])
def test_paged_decode_matches_oracle(dtype, tol, group):
    """Decode over scattered pages with ragged lengths == dense attention of
    one query against the per-slot prefix."""
    hkv, d = 2, 64
    hq = hkv * group
    num_seqs, pages_per_seq = 3, 4
    lengths = [200, 128, 77]  # ragged, crossing page boundaries

    pages = init_kv_pages(hkv, 16, PAGE, d, dtype)
    page_table = np.zeros((num_seqs, pages_per_seq), np.int32)
    rng = np.random.default_rng(0)
    kv_dense = []
    alloc = PageAllocator(16)
    for s, L in enumerate(lengths):
        n = -(-L // PAGE)
        ids = alloc.alloc(n)
        page_table[s, :n] = ids
        pad = n * PAGE
        k = jnp.asarray(rng.standard_normal((pad, hkv, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((pad, hkv, d)), jnp.float32)
        pages = write_prompt_kv(pages, k, v, jnp.asarray(ids, jnp.int32))
        kv_dense.append((k[:L], v[:L]))

    q = jnp.asarray(rng.standard_normal((num_seqs, hq, d)), jnp.float32)
    o = paged_decode_attention(
        q, pages, jnp.asarray(page_table), jnp.asarray(lengths, jnp.int32),
        compute_dtype=jnp.float32,
    )
    assert o.shape == (num_seqs, hq, d)

    for s, L in enumerate(lengths):
        k, v = kv_dense[s]
        if dtype == jnp.int8:
            # Oracle attends over the quantization-round-tripped K/V so the
            # tolerance isolates kernel error from quantization error.
            # _dequant_cache already returns [Hkv, L, D].
            k_rt, v_rt = _dequant_cache(pages, page_table, L, s, hkv, d)
            k = jnp.asarray(k_rt)
            v = jnp.asarray(v_rt)
        else:
            k = k.transpose(1, 0, 2)
            v = v.transpose(1, 0, 2)
        # GQA expand to query heads.
        k = jnp.repeat(k[None], group, axis=1).reshape(1, hq, L, d)
        v = jnp.repeat(v[None], group, axis=1).reshape(1, hq, L, d)
        o_ref = vanilla_attention(q[s][None, :, None, :], k, v)[0, :, 0]
        err = float(jnp.max(jnp.abs(o[s] - o_ref)))
        assert err < tol, f"slot {s}: err {err}"


def test_paged_decode_inactive_slot_zero():
    pages = init_kv_pages(1, 4, PAGE, 64, jnp.float32)
    q = jnp.ones((2, 1, 64))
    pt = jnp.zeros((2, 2), jnp.int32)
    o = paged_decode_attention(q, pages, pt, jnp.asarray([0, 0], jnp.int32),
                               compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(o), 0.0)


# ---------------------------------------------------------------------------
# Engine end-to-end
# ---------------------------------------------------------------------------


def _engine(cache_dtype=jnp.int8, **kw):
    cfg = TransformerConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = DecodeEngine(
        params, cfg, max_seqs=2, max_seq_len=512, page_size=PAGE,
        cache_dtype=cache_dtype, **kw,
    )
    return cfg, params, eng


def test_engine_generates_and_finishes():
    cfg, params, eng = _engine()
    reqs = eng.run([[5, 7, 11], [2, 3]], max_new_tokens=6)
    for r in reqs:
        assert r.done
        assert len(r.generated) == 6
        assert all(0 <= t < cfg.vocab_size for t in r.generated)
    # All pages returned to the allocator.
    assert eng.allocator.available == eng.allocator.num_pages - 1
    assert not eng.active.any()


def test_engine_continuous_batching_queues():
    """3 requests, 2 slots: the third admits after a slot frees."""
    cfg, params, eng = _engine()
    reqs = eng.run([[1, 2], [3, 4], [5, 6]], max_new_tokens=3)
    assert all(r.done and len(r.generated) == 3 for r in reqs)


def test_engine_batched_prefill_matches_sequential():
    """Same-bucket requests prefill as one GENUINE batch (asserted via a
    prefill-size probe); generations must equal one-at-a-time admission."""
    cfg, params, eng = _engine(cache_dtype=jnp.bfloat16)
    prompts = [[5, 17, 100], [42, 7, 9, 11]]
    batch_sizes = []
    orig = eng._prefill_batch

    def probe(reqs, slots, pad_len):
        batch_sizes.append(len(reqs))
        return orig(reqs, slots, pad_len)

    eng._prefill_batch = probe
    batched = [r.generated for r in eng.run(prompts, max_new_tokens=3)]
    assert max(batch_sizes) == 2, f"never batched: {batch_sizes}"

    cfg2, params2, eng2 = _engine(cache_dtype=jnp.bfloat16)
    seq = []
    for p in prompts:  # admit one at a time (forces B=1 prefill)
        seq.append(eng2.run([p], max_new_tokens=3)[0].generated)
    assert batched == seq


def test_engine_fp8_cache():
    cfg, params, eng = _engine(cache_dtype=jnp.float8_e4m3fn)
    reqs = eng.run([[5, 7, 11]], max_new_tokens=4)
    assert reqs[0].done and len(reqs[0].generated) == 4
    assert all(0 <= t < cfg.vocab_size for t in reqs[0].generated)


def test_engine_rejects_oversized_request():
    cfg, params, eng = _engine()
    with pytest.raises(ValueError, match="exceeds"):
        eng.submit(list(range(500)), max_new_tokens=100)  # 600 > 512


@pytest.mark.slow
def test_engine_greedy_matches_full_forward():
    """Greedy decode through the paged int8 path must match greedy decode
    via repeated full forwards (token-level parity gate, loose only through
    the int8 KV round trip — a disagreement means a bookkeeping bug)."""
    cfg, params, eng = _engine(cache_dtype=jnp.bfloat16)
    prompt = [5, 17, 100, 42]
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


def test_top_p_sampling_respects_nucleus():
    from cuda_flash_attention_tpu.decode.sampling import sample_tokens

    # One dominant token (p~0.97): top_p=0.5 must always pick it.
    logits = jnp.asarray([[10.0, 3.0, 2.0, 1.0, 0.0]])
    for i in range(8):
        t = sample_tokens(
            logits, jax.random.PRNGKey(i), temperature=1.0, top_p=0.5
        )
        assert int(t[0]) == 0
    # top_p=1.0 with flat logits samples everything eventually.
    flat = jnp.zeros((1, 4))
    seen = {
        int(sample_tokens(flat, jax.random.PRNGKey(i), temperature=1.0)[0])
        for i in range(40)
    }
    assert len(seen) >= 3


@pytest.mark.slow
def test_engine_with_int8_weights():
    """Weight-only int8 serving: quantized params flow through the same
    engine (prefill + decode) and generate valid tokens."""
    from cuda_flash_attention_tpu.quant import quantize_transformer_params

    cfg = TransformerConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    q_params = quantize_transformer_params(params, jnp.int8)
    eng = DecodeEngine(q_params, cfg, max_seqs=2, max_seq_len=512,
                       page_size=PAGE, cache_dtype=jnp.int8)
    reqs = eng.run([[5, 17, 100, 42]], max_new_tokens=4)
    assert reqs[0].done and len(reqs[0].generated) == 4
    assert all(0 <= t < cfg.vocab_size for t in reqs[0].generated)


def test_stop_sequences_end_generation():
    """Generation ends as soon as the generated tail matches a stop
    sequence (matched tokens stay in the transcript, like eos_id)."""
    cfg, params, eng = _engine()
    base = eng.run([[5, 7, 11]], max_new_tokens=8)[0].generated
    assert len(base) == 8  # greedy reference stream

    cfg2, params2, eng2 = _engine()
    stop = [base[2:4]]  # tokens 3..4 of the deterministic greedy stream
    r = eng2.run([[5, 7, 11]], max_new_tokens=8, stop=stop)[0]
    assert r.done and r.generated == base[:4]

    # Single-token stop behaves like eos.
    cfg3, params3, eng3 = _engine()
    r3 = eng3.run([[5, 7, 11]], max_new_tokens=8, stop=[[base[0]]])[0]
    assert r3.generated == base[:1]


def test_streaming_callback_sees_every_token():
    cfg, params, eng = _engine()
    seen = {0: [], 1: []}
    reqs = eng.submit_many([[5, 7, 11], [2, 3]], max_new_tokens=5)
    for i, r in enumerate(reqs):
        r.on_token = lambda t, i=i: seen[i].append(t)
    # First token was already emitted at prefill (submit_many admits
    # eagerly) — callbacks attach afterwards, so compare the tails.
    while any(not r.done for r in reqs):
        eng.step()
    eng.step()
    for i, r in enumerate(reqs):
        assert seen[i] == r.generated[len(r.generated) - len(seen[i]):]
        assert len(seen[i]) >= 4


def test_streaming_callback_via_run():
    cfg, params, eng = _engine()
    tokens = []
    reqs = eng.run([[5, 7, 11]], max_new_tokens=5,
                   on_token=tokens.append)
    assert tokens == reqs[0].generated


def test_logprobs_greedy_and_sampled():
    """logprobs=True fills per-token log-probabilities for prefill's first
    token and every decode step; greedy logprobs must equal the full
    forward's log_softmax at the argmax."""
    cfg, params, eng = _engine(logprobs=True)
    r = eng.run([[5, 7, 11]], max_new_tokens=4)[0]
    assert len(r.logprobs) == len(r.generated) == 4
    assert all(np.isfinite(lp) and lp <= 0.0 for lp in r.logprobs)

    # Oracle: greedy token 1's logprob == log_softmax of the full-forward
    # logits at the prompt's last position.
    logits = forward(
        params, jnp.asarray([[5, 7, 11]], jnp.int32), cfg
    )[0, -1].astype(jnp.float32)
    lp_ref = float(jax.nn.log_softmax(logits)[r.generated[0]])
    assert abs(r.logprobs[0] - lp_ref) < 5e-2  # bf16 engine vs fp32 ref

    cfg2, params2, eng2 = _engine(logprobs=True, temperature=0.9, top_k=8)
    r2 = eng2.run([[5, 7, 11]], max_new_tokens=4)[0]
    assert len(r2.logprobs) == 4
    assert all(np.isfinite(lp) and lp <= 0.0 for lp in r2.logprobs)


def test_logprobs_under_greedy_speculation_match_plain():
    """Greedy spec with logprobs: same tokens AND same logprobs as the
    plain greedy engine (accepted drafts equal the target's argmax, so
    the logprob convention coincides)."""
    import dataclasses

    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    plain = DecodeEngine(params, cfg, max_seqs=1, max_seq_len=512,
                         page_size=PAGE, cache_dtype=jnp.float32,
                         logprobs=True)
    r1 = plain.run([[5, 17, 100, 42]], max_new_tokens=6)[0]

    draft_cfg = dataclasses.replace(cfg, n_layers=1)
    spec = DecodeEngine(params, cfg, max_seqs=1, max_seq_len=512,
                        page_size=PAGE, cache_dtype=jnp.float32,
                        logprobs=True, spec_tokens=3,
                        draft_params=init_params(jax.random.PRNGKey(9),
                                                 draft_cfg),
                        draft_cfg=draft_cfg)
    r2 = spec.run([[5, 17, 100, 42]], max_new_tokens=6)[0]
    assert r2.generated == r1.generated
    assert len(r2.logprobs) == 6
    np.testing.assert_allclose(r2.logprobs, r1.logprobs, atol=1e-4)


def test_logit_bias_bans_and_pins_tokens():
    """Per-request logit_bias: -inf bans a token across prefill AND decode
    steps; a huge positive bias pins every sampled token."""
    cfg, params, eng = _engine()
    base = eng.run([[5, 7, 11]], max_new_tokens=6)[0].generated

    cfg2, params2, eng2 = _engine()
    banned = set(base)
    r = eng2.run([[5, 7, 11]], max_new_tokens=6,
                 logit_bias={t: float("-inf") for t in banned})[0]
    assert not (set(r.generated) & banned), (r.generated, banned)
    assert len(r.generated) == 6

    cfg3, params3, eng3 = _engine()
    r3 = eng3.run([[5, 7, 11]], max_new_tokens=4, logit_bias={42: 1e9})[0]
    assert r3.generated == [42] * 4

    # Unbiased requests in the same engine afterwards are unaffected.
    r4 = eng3.run([[5, 7, 11]], max_new_tokens=6)[0]
    assert r4.generated == base


def test_logit_bias_under_speculation():
    """Banned tokens stay banned through the verify path (greedy spec via
    prompt lookup — no draft model needed)."""
    import dataclasses

    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    plain = DecodeEngine(params, cfg, max_seqs=1, max_seq_len=512,
                         page_size=PAGE, cache_dtype=jnp.float32)
    base = plain.run([[5, 7, 11] * 8], max_new_tokens=8)[0].generated

    eng = DecodeEngine(params, cfg, max_seqs=1, max_seq_len=512,
                       page_size=PAGE, cache_dtype=jnp.float32,
                       spec_tokens=3, spec_mode="prompt_lookup")
    banned = {base[0], base[1]}
    r = eng.run([[5, 7, 11] * 8], max_new_tokens=8,
                logit_bias={t: float("-inf") for t in banned})[0]
    assert not (set(r.generated) & banned)
    assert len(r.generated) == 8


def test_generate_n_best_of():
    """Best-of-n: n completions sorted by total logprob; best_of returns
    the winner only; greedy engines with n>1 must demand logprobs."""
    cfg, params, eng = _engine(temperature=0.9, logprobs=True)
    outs = eng.generate_n([5, 7, 11], n=3, max_new_tokens=5)
    assert len(outs) == 3 and all(len(r.generated) == 5 for r in outs)
    totals = [sum(r.logprobs) for r in outs]
    assert totals == sorted(totals, reverse=True)
    best = eng.generate_n([5, 7, 11], n=2, max_new_tokens=4, best_of=True)
    assert len(best) == 1 and best[0].done

    cfg2, params2, eng2 = _engine()  # no logprobs
    with pytest.raises(ValueError, match="logprobs"):
        eng2.generate_n([1, 2], n=2)


def test_cancel_requests():
    """cancel(): pending requests leave the queue; an active request
    retires on the next step with its pages returned; a mid-chunked-
    prefill request stops chunking."""
    cfg, params, eng = _engine()
    a = eng.submit([1, 2, 3], max_new_tokens=30)
    b = eng.submit([4, 5], max_new_tokens=30)
    c = eng.submit([6, 7], max_new_tokens=30)  # queued (2 slots)
    assert eng.cancel(c) and c.done
    eng.step()
    assert eng.cancel(a)
    for _ in range(3):
        eng.step()
    assert a.done and len(a.generated) < 30
    while not b.done:
        eng.step()
    eng.step()
    assert eng.allocator.available == eng.allocator.num_pages - 1
    assert not eng.cancel(b)  # already finished

    # Mid-chunked-prefill cancellation frees everything too.
    import dataclasses
    fcfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None,
    )
    fparams = init_params(jax.random.PRNGKey(0), fcfg)
    eng2 = DecodeEngine(fparams, fcfg, max_seqs=1, max_seq_len=512,
                        page_size=PAGE, cache_dtype=jnp.float32,
                        prefill_chunk=128)
    long_prompt = list(np.random.default_rng(0).integers(0, 200, 400))
    r = eng2.submit(long_prompt, max_new_tokens=8)
    eng2.step()  # first chunk only
    assert bool(eng2.prefilling[r.slot])
    eng2.cancel(r)
    eng2.step()
    assert r.done and not eng2.prefilling.any()
    assert eng2.allocator.available == eng2.allocator.num_pages - 1


def test_request_latency_metrics():
    """TTFT/TPOT observability: stamps are ordered and the derived metrics
    are positive once a request finishes."""
    cfg, params, eng = _engine()
    r = eng.run([[5, 7, 11]], max_new_tokens=5)[0]
    assert r.submitted_at <= r.first_token_at <= r.finished_at
    assert r.ttft_s is not None and r.ttft_s >= 0.0
    assert r.tpot_s is not None and r.tpot_s >= 0.0
    # An unfinished request reports None for TPOT.
    eng2 = DecodeEngine(params, cfg, max_seqs=2, max_seq_len=512,
                        page_size=PAGE, cache_dtype=jnp.int8)
    q = eng2.submit([1, 2, 3], max_new_tokens=8)
    eng2.step()
    assert not q.done and q.tpot_s is None and q.ttft_s is not None


def test_frequency_penalty_blocks_repetition():
    """A huge frequency penalty forbids re-emitting any generated token —
    all tokens distinct; without it greedy tiny models often loop."""
    cfg, params, eng = _engine()
    r = eng.run([[5, 7, 11]], max_new_tokens=12,
                frequency_penalty=1e9)[0]
    assert len(r.generated) == 12
    assert len(set(r.generated)) == 12, r.generated

    # Presence penalty with 0 magnitude changes nothing vs the base run.
    cfg2, params2, eng2 = _engine()
    base = eng2.run([[5, 7, 11]], max_new_tokens=6)[0].generated
    cfg3, params3, eng3 = _engine()
    same = eng3.run([[5, 7, 11]], max_new_tokens=6,
                    presence_penalty=0.0)[0].generated
    assert same == base


def test_min_p_sampling():
    """min_p keeps only tokens with p >= min_p * p_max: with one dominant
    token and min_p above the runner-up's ratio, sampling is pinned."""
    from cuda_flash_attention_tpu.decode.sampling import sample_tokens

    logits = jnp.asarray([[8.0, 4.0, 0.0, -4.0]])  # p ~ [0.982, 0.018, ..]
    for i in range(24):
        t = sample_tokens(logits, jax.random.PRNGKey(i), temperature=1.0,
                          min_p=0.1)
        assert int(t[0]) == 0
    # Low threshold keeps the runner-up reachable.
    seen = {
        int(sample_tokens(logits, jax.random.PRNGKey(i), temperature=1.0,
                          min_p=0.001)[0])
        for i in range(200)
    }
    assert 1 in seen
    with pytest.raises(ValueError, match="min_p"):
        sample_tokens(logits, jax.random.PRNGKey(0), temperature=1.0,
                      min_p=1.5)


def test_top_p_validation():
    from cuda_flash_attention_tpu.decode.sampling import sample_tokens

    with pytest.raises(ValueError, match="top_p"):
        sample_tokens(jnp.zeros((1, 4)), jax.random.PRNGKey(0),
                      temperature=1.0, top_p=0.0)


def test_engine_respects_max_new_tokens_one():
    """A request that finishes AT prefill (max_new_tokens=1) must not get an
    extra decode token when it is admitted inside step()'s admission pass."""
    cfg = TransformerConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = DecodeEngine(params, cfg, max_seqs=1, max_seq_len=512,
                       page_size=PAGE, cache_dtype=jnp.bfloat16)
    reqs = eng.run([[1, 2, 3], [4, 5, 6]], max_new_tokens=1)
    assert [len(r.generated) for r in reqs] == [1, 1], \
        [r.generated for r in reqs]


def test_engine_rejects_bad_page_size():
    cfg = TransformerConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="page_size"):
        DecodeEngine(params, cfg, page_size=96)


# ---------------------------------------------------------------------------
# Scanned (stacked-layer) decode path vs the per-layer loop path
# ---------------------------------------------------------------------------


def test_scanned_decode_matches_loop():
    """decode_step over stacked params + stacked cache (the lax.scan fast
    path, round-3 dispatch-amortization work) must match the per-layer
    Python-loop path step for step."""
    from cuda_flash_attention_tpu.decode import (
        decode_step,
        init_kv_pages_stacked,
        prefill_forward,
        write_prompt_kv_stacked,
    )
    import dataclasses

    from cuda_flash_attention_tpu.models import stack_layer_params

    # fp32 activations AND highest matmul precision: the two paths then
    # differ only by XLA op ordering (~1e-6).  At the TPU default precision
    # fp32 matmuls run as single-pass bf16, and scan-vs-unrolled scheduling
    # re-rounds differently (~5e-3 on logits) — that's noise, not a bug.
    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None
    )
    prec = jax.default_matmul_precision("highest")
    prec.__enter__()
    params = init_params(jax.random.PRNGKey(0), cfg)
    sparams = {**params, "layers": stack_layer_params(params["layers"])}

    b, s = 2, PAGE
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0,
                                cfg.vocab_size)
    logits_l, kv_list = jax.jit(
        lambda p, t: prefill_forward(p, t, cfg)
    )(params, tokens)
    logits_s, (k_all, v_all) = jax.jit(
        lambda p, t: prefill_forward(p, t, cfg)
    )(sparams, tokens)
    np.testing.assert_allclose(
        np.asarray(logits_l), np.asarray(logits_s), atol=1e-4
    )

    # Build both cache layouts with the same prompt KV.
    num_pages = 2 * b + 1
    caches_l = [
        init_kv_pages(cfg.n_kv_heads, num_pages, PAGE, cfg.head_dim,
                      jnp.int8)
        for _ in range(cfg.n_layers)
    ]
    caches_s = init_kv_pages_stacked(
        cfg.n_layers, cfg.n_kv_heads, num_pages, PAGE, cfg.head_dim,
        jnp.int8,
    )
    page_table = np.zeros((b, 2), np.int32)
    for slot in range(b):
        ids = [1 + 2 * slot, 2 + 2 * slot]
        page_table[slot, :] = ids
        ids_dev = jnp.asarray(ids[:1], jnp.int32)
        for li in range(cfg.n_layers):
            k, v = kv_list[li]
            caches_l[li] = write_prompt_kv(caches_l[li], k[slot], v[slot],
                                           ids_dev)
        caches_s = write_prompt_kv_stacked(
            caches_s, k_all[:, slot], v_all[:, slot], ids_dev
        )
    np.testing.assert_array_equal(
        np.stack([np.asarray(c.k_pages) for c in caches_l]),
        np.asarray(caches_s.k_pages),
    )

    page_table = jnp.asarray(page_table)
    positions = jnp.full((b,), s, jnp.int32)
    active = jnp.ones((b,), bool)
    last = jnp.argmax(logits_l[:, -1], axis=-1).astype(jnp.int32)
    out_l, caches_l = decode_step(
        params, last, positions, caches_l, page_table, active, cfg
    )
    out_s, caches_s = decode_step(
        sparams, last, positions, caches_s, page_table, active, cfg
    )
    np.testing.assert_allclose(
        np.asarray(out_l), np.asarray(out_s), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.stack([np.asarray(c.v_pages) for c in caches_l]),
        np.asarray(caches_s.v_pages),
    )
    prec.__exit__(None, None, None)


@pytest.mark.parametrize("w8a8", [False, True])
def test_scanned_decode_with_quantized_weights(w8a8):
    """Quantize-then-stack: QuantizedTensor is a pytree, so
    stack_layer_params stacks values/scales leaf-wise and the lax.scan body
    slices a 2D int8 weight + 1D scale per layer (decode_bench.build_state
    contract).  The scanned step must match the per-layer loop running the
    SAME quantized params."""
    import dataclasses

    from cuda_flash_attention_tpu.decode import (
        decode_step,
        init_kv_pages_stacked,
        prefill_forward,
        write_prompt_kv_stacked,
    )
    from cuda_flash_attention_tpu.models import stack_layer_params
    from cuda_flash_attention_tpu.quant.linear import (
        quantize_transformer_params,
    )

    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None
    )
    with jax.default_matmul_precision("highest"):
        params = init_params(jax.random.PRNGKey(0), cfg)
        params = quantize_transformer_params(
            params, jnp.int8, act_quant=w8a8
        )
        sparams = {**params, "layers": stack_layer_params(params["layers"])}

        b, s = 2, PAGE
        tokens = jax.random.randint(
            jax.random.PRNGKey(1), (b, s), 0, cfg.vocab_size
        )
        logits_l, kv_list = jax.jit(
            lambda p, t: prefill_forward(p, t, cfg)
        )(params, tokens)
        logits_s, (k_all, v_all) = jax.jit(
            lambda p, t: prefill_forward(p, t, cfg)
        )(sparams, tokens)
        np.testing.assert_allclose(
            np.asarray(logits_l), np.asarray(logits_s), atol=1e-4
        )

        num_pages = 2 * b + 1
        caches_l = [
            init_kv_pages(cfg.n_kv_heads, num_pages, PAGE, cfg.head_dim,
                          jnp.int8)
            for _ in range(cfg.n_layers)
        ]
        caches_s = init_kv_pages_stacked(
            cfg.n_layers, cfg.n_kv_heads, num_pages, PAGE, cfg.head_dim,
            jnp.int8,
        )
        page_table = np.zeros((b, 2), np.int32)
        for slot in range(b):
            ids = [1 + 2 * slot, 2 + 2 * slot]
            page_table[slot, :] = ids
            ids_dev = jnp.asarray(ids[:1], jnp.int32)
            for li in range(cfg.n_layers):
                k, v = kv_list[li]
                caches_l[li] = write_prompt_kv(
                    caches_l[li], k[slot], v[slot], ids_dev
                )
            caches_s = write_prompt_kv_stacked(
                caches_s, k_all[:, slot], v_all[:, slot], ids_dev
            )

        page_table = jnp.asarray(page_table)
        positions = jnp.full((b,), s, jnp.int32)
        active = jnp.ones((b,), bool)
        last = jnp.argmax(logits_l[:, -1], axis=-1).astype(jnp.int32)
        out_l, _ = decode_step(
            params, last, positions, caches_l, page_table, active, cfg
        )
        out_s, _ = decode_step(
            sparams, last, positions, caches_s, page_table, active, cfg
        )
        np.testing.assert_allclose(
            np.asarray(out_l), np.asarray(out_s), atol=1e-4
        )
        assert np.isfinite(np.asarray(out_s)).all()


# ---------------------------------------------------------------------------
# Burst decode: N chained steps per device dispatch (decode_burst > 1).
# ---------------------------------------------------------------------------


def test_burst_decode_matches_plain_greedy():
    """decode_burst=4 emits exactly the plain engine's greedy tokens AND
    logprobs (same device math per step; only the dispatch granularity
    changes), across requests whose budgets are not burst multiples."""
    cfg, params, eng = _engine(logprobs=True)
    r_plain = eng.run([[5, 7, 11], [2, 3]], max_new_tokens=6)

    cfg2, params2, eng2 = _engine(logprobs=True, decode_burst=4)
    r_burst = eng2.run([[5, 7, 11], [2, 3]], max_new_tokens=6)
    for a, b in zip(r_plain, r_burst):
        assert a.generated == b.generated
        np.testing.assert_allclose(a.logprobs, b.logprobs, atol=1e-5)


def test_burst_decode_eos_and_stop_mid_burst():
    """A request hitting EOS (or a stop sequence) mid-burst truncates there
    — tokens sampled past the finish are discarded, lengths stay exact, and
    the slot frees for the pending queue."""
    cfg, params, eng = _engine()
    base = eng.run([[5, 7, 11]], max_new_tokens=8)[0].generated
    assert len(base) == 8

    # Use the 3rd greedy token as EOS: the burst engine must stop there.
    eos = base[2]
    cfg2, params2, eng2 = _engine(decode_burst=4)
    r = eng2.run([[5, 7, 11]], max_new_tokens=8, eos_id=eos)[0]
    assert r.generated == base[: base.index(eos) + 1]

    cfg3, params3, eng3 = _engine(decode_burst=4)
    r3 = eng3.run([[5, 7, 11]], max_new_tokens=8, stop=[base[1:3]])[0]
    assert r3.generated == base[:3]


def test_burst_decode_sampled_finite_and_budgeted():
    """Sampled burst decode: budgets respected, logprobs finite, RNG
    advances (two engines with different seeds diverge)."""
    cfg, params, eng = _engine(temperature=0.8, seed=1, logprobs=True,
                               decode_burst=3)
    reqs = eng.run([[5, 7, 11], [2, 3]], max_new_tokens=5)
    for r in reqs:
        assert len(r.generated) == 5
        assert all(np.isfinite(lp) and lp <= 0.0 for lp in r.logprobs)


def test_burst_decode_penalties_on_device_match_plain():
    """Repetition penalties replay ON-DEVICE inside the burst (occurrence
    counts carried through the fori_loop), so penalized requests keep the
    burst fast path — greedy outputs match the per-token engine exactly,
    and the burst dispatch counter confirms the fast path actually ran."""
    cfg, params, eng = _engine()
    base = eng.run([[5, 7, 11], [2, 3]], max_new_tokens=6,
                   presence_penalty=0.5, frequency_penalty=0.25)
    base_toks = [r.generated for r in base]

    cfg2, params2, eng2 = _engine(decode_burst=4)
    got = eng2.run([[5, 7, 11], [2, 3]], max_new_tokens=6,
                   presence_penalty=0.5, frequency_penalty=0.25)
    assert [r.generated for r in got] == base_toks
    assert eng2.stats.get("burst_dispatches", 0) > 0

    # Mixed batch: one penalized + one plain request share the same bursts.
    cfg3, params3, eng3 = _engine(decode_burst=4)
    r1 = eng3.submit([5, 7, 11], max_new_tokens=6, presence_penalty=0.5)
    r2 = eng3.submit([2, 3], max_new_tokens=6)
    while not (r1.done and r2.done):
        eng3.step()
    cfgp, paramsp, engp = _engine()
    assert r1.generated == engp.run(
        [[5, 7, 11]], max_new_tokens=6, presence_penalty=0.5
    )[0].generated
    assert r2.generated == engp.run(
        [[2, 3]], max_new_tokens=6
    )[0].generated


def test_burst_decode_interleaves_chunked_prefill():
    """Chunked prefill no longer blocks bursting: while a long prompt
    chunks in, decoding slots advance in (capped) bursts, and the finished
    outputs match the per-token engine token-for-token."""
    long_prompt = list(range(1, 2 * PAGE + 3))
    short = [5, 7, 11]
    cfg, params, eng = _engine(prefill_chunk=PAGE)
    base = eng.run([short, long_prompt], max_new_tokens=6)
    base_toks = [r.generated for r in base]

    cfg2, params2, eng2 = _engine(prefill_chunk=PAGE, decode_burst=4,
                                  prefill_burst_cap=2)
    got = eng2.run([short, long_prompt], max_new_tokens=6)
    assert [r.generated for r in got] == base_toks
    assert eng2.stats.get("burst_dispatches", 0) > 0
    assert eng2.stats["prefill_chunks"] > 0


def test_burst_decode_logit_bias_stays_fast_path():
    """Static logit_bias rows are constant within a burst: bans hold and
    the burst path is used (stats['steps'] advances by bursts)."""
    cfg, params, eng = _engine(decode_burst=4)
    base = eng.run([[5, 7, 11]], max_new_tokens=6)[0].generated
    banned = set(base)
    r = eng.run([[5, 7, 11]], max_new_tokens=6,
                logit_bias={t: float("-inf") for t in banned})[0]
    assert not (set(r.generated) & banned)
    assert len(r.generated) == 6
