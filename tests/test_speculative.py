"""Speculative decoding: draft-and-verify must produce EXACTLY the greedy
sequence of the plain path (acceptance only reorders work, never changes
results), regardless of draft quality.  A perfect draft (draft == target)
must accept whole chunks — fewer target passes per token.

Parity tests run in fp32: in bf16, logits can TIE exactly (observed: two
tokens both at 2.34375) and different compiled programs (single-token step
vs chunked verify) may break the tie through 1-ulp fusion differences —
spec decode guarantees the target's greedy rule under its own program's
numerics, not bitwise parity with a differently-compiled program."""

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


def _models():
    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    # A real (smaller/other-weights) draft: same vocab, different seed — a
    # BAD draft, so acceptance must survive frequent rejection.
    draft_cfg = dataclasses.replace(cfg, n_layers=1)
    draft_params = init_params(jax.random.PRNGKey(9), draft_cfg)
    return cfg, params, draft_cfg, draft_params


def _spec_engine(cfg, params, draft_cfg, draft_params, k, **kw):
    return DecodeEngine(
        params, cfg, max_seqs=2, max_seq_len=512, page_size=PAGE,
        cache_dtype=jnp.float32, draft_params=draft_params,
        draft_cfg=draft_cfg, spec_tokens=k, **kw,
    )


@pytest.mark.slow
def test_spec_matches_plain_greedy_and_full_forward():
    cfg, params, draft_cfg, draft_params = _models()
    prompts = [[5, 17, 100, 42], [7, 3]]
    steps = 7
    spec = _spec_engine(cfg, params, draft_cfg, draft_params, k=3)
    spec_out = [r.generated for r in spec.run(prompts, max_new_tokens=steps)]

    plain = DecodeEngine(params, cfg, max_seqs=2, max_seq_len=512,
                         page_size=PAGE, cache_dtype=jnp.float32)
    plain_out = [r.generated for r in plain.run(prompts, max_new_tokens=steps)]
    assert spec_out == plain_out, f"spec {spec_out} vs plain {plain_out}"

    # ... and both match repeated full forwards (the independent oracle).
    for p_idx, prompt in enumerate(prompts):
        toks = list(prompt)
        full = []
        for _ in range(steps):
            logits = forward(params, jnp.asarray([toks], jnp.int32), cfg)
            nxt = int(jnp.argmax(logits[0, -1]))
            full.append(nxt)
            toks.append(nxt)
        assert spec_out[p_idx] == full


@pytest.mark.slow
def test_perfect_draft_accepts_chunks():
    """Draft == target: every draft token verifies, so each round commits
    spec_tokens+1 tokens and the target runs ~steps/(k+1) verify passes."""
    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    k = 3
    eng = _spec_engine(cfg, params, cfg, params, k=k)
    rounds = 0
    orig = eng._verify_fn

    def probe(*a, **kw):
        nonlocal rounds
        rounds += 1
        return orig(*a, **kw)

    eng._verify_fn = probe
    steps = 12
    req = eng.run([[5, 17, 100]], max_new_tokens=steps)[0]
    assert len(req.generated) == steps
    # 12 tokens at k+1=4 per round = 3 rounds (prefill's first token counts
    # toward the 12, so allow one extra round of slack).
    assert rounds <= -(-steps // (k + 1)) + 1, rounds


def test_spec_rejects_bad_config():
    cfg, params, draft_cfg, draft_params = _models()
    with pytest.raises(ValueError, match="draft_params"):
        DecodeEngine(params, cfg, max_seqs=1, max_seq_len=256,
                     page_size=PAGE, spec_tokens=2)


def test_spec_rejects_exact_fit_request():
    """Speculative rounds append up to spec_tokens rejected-draft positions
    past the final length; a prompt+max_new that exactly fills max_seq_len
    would make those writes clamp into the last live page and corrupt it —
    submit must reject (regression: page-table width overflow)."""
    cfg, params, draft_cfg, draft_params = _models()
    eng = _spec_engine(cfg, params, draft_cfg, draft_params, k=3)
    cap = 512  # max_seq_len in _spec_engine
    with pytest.raises(ValueError, match="speculative"):
        eng.submit([1] * 64, max_new_tokens=cap - 64)
    # With the overshoot margin it admits fine (no need to run it out).
    req = eng.submit([1] * 64, max_new_tokens=cap - 64 - 3)
    assert req.slot is not None


# ---------------------------------------------------------------------------
# Speculative SAMPLING (temperature > 0): the acceptance rule must emit
# tokens distributed exactly as target-only sampling.
# ---------------------------------------------------------------------------


def test_speculative_accept_matches_target_distribution():
    """First emitted token across many trials ~ pt_0 regardless of how far
    the draft distribution is from the target (the algorithm's defining
    guarantee)."""
    from cuda_flash_attention_tpu.decode.sampling import speculative_accept

    v, k, n = 5, 2, 40_000
    pt0 = jnp.asarray([0.05, 0.40, 0.25, 0.20, 0.10])
    ptk = jnp.asarray([0.20] * 5)
    pd0 = jnp.asarray([0.50, 0.10, 0.10, 0.10, 0.20])  # deliberately bad
    pt = jnp.broadcast_to(
        jnp.stack([pt0, ptk, ptk]), (n, k + 1, v)
    )
    draft_probs = jnp.broadcast_to(jnp.stack([pd0, ptk]), (n, k, v))
    key = jax.random.PRNGKey(0)
    kd, ka = jax.random.split(key)
    drafts = jnp.stack(
        [
            jax.random.categorical(
                jax.random.fold_in(kd, i), jnp.log(draft_probs[:, i]), axis=-1
            )
            for i in range(k)
        ],
        axis=1,
    ).astype(jnp.int32)
    m, final = speculative_accept(pt, drafts, draft_probs, ka)
    first = jnp.where(m >= 1, drafts[:, 0], final)
    freq = np.bincount(np.asarray(first), minlength=v) / n
    np.testing.assert_allclose(freq, np.asarray(pt0), atol=0.02)
    # Sanity: both acceptance and rejection paths actually fired.
    assert 0.05 < float(jnp.mean((m >= 1))) < 0.95


@pytest.mark.slow
def test_spec_sampled_engine_generates():
    cfg, params, draft_cfg, draft_params = _models()
    eng = _spec_engine(cfg, params, draft_cfg, draft_params, k=3,
                       temperature=0.8)
    reqs = eng.run([[5, 17, 100, 42], [7, 3]], max_new_tokens=8)
    for r in reqs:
        assert r.done and len(r.generated) == 8
        assert all(0 <= t < cfg.vocab_size for t in r.generated)
    assert eng.allocator.available == eng.allocator.num_pages - 1


def test_spec_stop_sequence_mid_chunk():
    """A stop sequence hit INSIDE an accepted speculative chunk must end
    the request exactly at the match (no trailing accepted tokens)."""
    cfg, params, draft_cfg, draft_params = _models()
    base = DecodeEngine(
        params, cfg, max_seqs=1, max_seq_len=512, page_size=PAGE,
        cache_dtype=jnp.float32,
    ).run([[5, 17, 100, 42]], max_new_tokens=8)[0].generated

    eng = _spec_engine(cfg, params, draft_cfg, draft_params, k=3)
    r = eng.run([[5, 17, 100, 42]], max_new_tokens=8,
                stop=[base[1:3]])[0]
    assert r.done and r.generated == base[:3]
    assert eng.allocator.available == eng.allocator.num_pages - 1


def test_spec_sampled_topk_topp_generates():
    """Modified distributions (top-k / nucleus) under speculation: both
    sides warp identically (sampling.warp_logits), so generation stays
    in-vocab and completes; acceptance still fires."""
    cfg, params, draft_cfg, draft_params = _models()
    for kw in ({"top_k": 5}, {"top_p": 0.9}, {"top_k": 8, "top_p": 0.7}):
        eng = _spec_engine(cfg, params, draft_cfg, draft_params, k=2,
                           temperature=0.8, **kw)
        reqs = eng.run([[5, 17, 100, 42]], max_new_tokens=6)
        assert reqs[0].done and len(reqs[0].generated) == 6
        assert all(0 <= t < cfg.vocab_size for t in reqs[0].generated)
    assert eng.allocator.available == eng.allocator.num_pages - 1


def test_spec_sampled_topk_matches_target_distribution():
    """Draft == target with top-k warping: every draft must be accepted
    (pd == pt identically), so the acceptance path is exact under the
    modified distribution too."""
    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = _spec_engine(cfg, params, cfg, params, k=3, temperature=0.8,
                       top_k=4)
    eng.run([[5, 17, 100]], max_new_tokens=8)
    assert eng.acceptance_rate == 1.0


def test_spec_sampled_logprobs_finite():
    """Sampled speculation with logprobs: one log-probability per emitted
    token, finite and <= 0, under the warped target distribution."""
    cfg, params, draft_cfg, draft_params = _models()
    eng = _spec_engine(cfg, params, draft_cfg, draft_params, k=3,
                       temperature=0.8, top_k=10, logprobs=True)
    r = eng.run([[5, 17, 100, 42]], max_new_tokens=8)[0]
    assert len(r.logprobs) == len(r.generated) == 8
    assert all(np.isfinite(lp) and lp <= 0.0 for lp in r.logprobs)


def test_prompt_lookup_greedy_matches_plain():
    """Prompt-lookup speculation (NO draft model): exact greedy parity
    with the plain engine, and a repetitive prompt must actually get
    drafts accepted (the n-gram match predicts the continuation)."""
    cfg, params, _, _ = _models()
    # Repetitive prompt: the model tends to continue cycles, so lookup
    # proposals from prior occurrences match often.
    prompt = [5, 17, 100, 42] * 12
    plain = DecodeEngine(params, cfg, max_seqs=1, max_seq_len=512,
                         page_size=PAGE, cache_dtype=jnp.float32)
    ref = plain.run([prompt], max_new_tokens=10)[0].generated

    eng = DecodeEngine(params, cfg, max_seqs=1, max_seq_len=512,
                       page_size=PAGE, cache_dtype=jnp.float32,
                       spec_tokens=3, spec_mode="prompt_lookup")
    r = eng.run([prompt], max_new_tokens=10)[0]
    assert r.generated == ref, (r.generated, ref)
    assert eng.stats["spec_rounds"] > 0
    assert eng.allocator.available == eng.allocator.num_pages - 1


def test_prompt_lookup_sampled_generates():
    """Sampled prompt-lookup: deterministic drafts verify against a
    one-hot pd — generation completes in-vocab with logprobs."""
    cfg, params, _, _ = _models()
    eng = DecodeEngine(params, cfg, max_seqs=2, max_seq_len=512,
                       page_size=PAGE, cache_dtype=jnp.float32,
                       spec_tokens=3, spec_mode="prompt_lookup",
                       temperature=0.8, top_k=20, logprobs=True)
    reqs = eng.run([[5, 17, 100, 42] * 8, [7, 3]], max_new_tokens=8)
    for r in reqs:
        assert r.done and len(r.generated) == 8
        assert all(0 <= t < cfg.vocab_size for t in r.generated)
        assert len(r.logprobs) == 8
        assert all(np.isfinite(lp) and lp <= 0 for lp in r.logprobs)


def test_prompt_lookup_validation():
    cfg, params, draft_cfg, draft_params = _models()
    with pytest.raises(ValueError, match="no draft model"):
        DecodeEngine(params, cfg, max_seqs=1, max_seq_len=256,
                     page_size=PAGE, spec_tokens=2,
                     spec_mode="prompt_lookup", draft_params=draft_params,
                     draft_cfg=draft_cfg)
    with pytest.raises(ValueError, match="spec_mode"):
        DecodeEngine(params, cfg, max_seqs=1, max_seq_len=256,
                     page_size=PAGE, spec_tokens=2, spec_mode="banana")


def test_acceptance_stats():
    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    perfect = _spec_engine(cfg, params, cfg, params, k=3)
    perfect.run([[5, 17, 100]], max_new_tokens=8)
    assert perfect.acceptance_rate == 1.0  # draft == target: all accepted
    assert perfect.stats["tokens"] >= 8

    plain = DecodeEngine(params, cfg, max_seqs=1, max_seq_len=512,
                         page_size=PAGE, cache_dtype=jnp.float32)
    plain.run([[5, 17, 100]], max_new_tokens=4)
    assert plain.acceptance_rate is None
    assert plain.stats["tokens"] >= 4 and plain.stats["steps"] >= 3
