"""Token sampling for the decode engine: greedy, temperature, top-k.

Pure-jnp, static-shaped (top-k uses lax.top_k with a static k) so the whole
sample step fuses into the decode jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def warp_logits(
    logits,       # [num_seqs, vocab]
    *,
    temperature: float,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
):
    """Temperature + nucleus + top-k + min-p warping as SUPPORT FILTERING:
    returns logits/temperature with every non-kept entry at -inf, so
    softmax(warped) is the exact sampling distribution.  One shared
    definition serves both the direct decode step and BOTH sides of
    speculative sampling — the Leviathan acceptance rule is exact for any
    (pd, pt) pair as long as drafts are sampled from pd and both are the
    same warp of their model's logits.

    top_k keeps every token tied with the k-th largest logit (support
    filtering), matching the nucleus rule's tie behavior.  min_p keeps
    tokens whose probability is >= min_p * p(top token) — the
    entropy-adaptive truncation rule."""
    if not 0.0 < top_p <= 1.0:
        raise ValueError(
            f"top_p must be in (0, 1]; got {top_p} (use temperature=0 for "
            "greedy decoding)"
        )
    if not 0.0 <= min_p < 1.0:
        raise ValueError(f"min_p must be in [0, 1); got {min_p}")
    logits = logits / temperature
    if min_p > 0.0:
        # p_i >= min_p * p_max  <=>  logit_i >= logit_max + log(min_p)
        # (same softmax denominator on both sides).
        cutoff = jnp.max(logits, axis=-1, keepdims=True) + jnp.log(min_p)
        logits = jnp.where(logits >= cutoff, logits, -jnp.inf)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]  # descending
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep tokens while the mass BEFORE them is < p (always >= 1 token);
        # cutoff = smallest kept logit per row.
        keep_mass = cum - probs < top_p
        cutoff = jnp.min(
            jnp.where(keep_mass, sorted_logits, jnp.inf), axis=-1
        )
        logits = jnp.where(logits >= cutoff[:, None], logits, -jnp.inf)
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1]  # [n]
        logits = jnp.where(logits >= kth[:, None], logits, -jnp.inf)
    return logits


@functools.partial(
    jax.jit, static_argnames=("temperature", "top_k", "top_p", "min_p")
)
def sample_tokens(
    logits,       # [num_seqs, vocab]
    key,          # PRNG key
    *,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
):
    """Sample one token per row. temperature<=0 -> greedy; top_k>0 restricts
    to the k most likely tokens; top_p<1 restricts to the smallest nucleus
    whose probability mass reaches p (static-shaped: sort + cumsum);
    min_p>0 drops tokens below min_p * p(top token)."""
    if temperature <= 0.0:
        # Still validate so a bad top_p fails loudly in greedy mode too.
        if not 0.0 < top_p <= 1.0:
            raise ValueError(
                f"top_p must be in (0, 1]; got {top_p} (use temperature=0 "
                "for greedy decoding)"
            )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    warped = warp_logits(
        logits, temperature=temperature, top_k=top_k, top_p=top_p,
        min_p=min_p,
    )
    return jax.random.categorical(key, warped, axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("temperature", "top_k", "top_p", "min_p")
)
def sample_with_logprob(
    logits,       # [num_seqs, vocab]
    key,
    *,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
):
    """sample_tokens PLUS the log-probability of each chosen token under
    the distribution it was drawn from: log_softmax(logits) at the argmax
    for greedy, log_softmax(warped) for sampled — always finite, since the
    chosen token is inside the warped support."""
    if temperature <= 0.0:
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lp = jax.nn.log_softmax(logits, axis=-1)
    else:
        warped = warp_logits(
            logits, temperature=temperature, top_k=top_k, top_p=top_p,
            min_p=min_p,
        )
        tok = jax.random.categorical(key, warped, axis=-1).astype(jnp.int32)
        lp = jax.nn.log_softmax(warped, axis=-1)
    return tok, jnp.take_along_axis(lp, tok[:, None], axis=-1)[:, 0]


def speculative_accept(
    pt,           # [n, k+1, V] target probs at chunk positions 0..k
    drafts,       # [n, k] int32 draft tokens d1..dk
    draft_probs,  # [n, k, V] draft probs the drafts were sampled from
    key,
):
    """Speculative-SAMPLING acceptance (Leviathan et al. / Chen et al.):
    accept draft d_i with prob min(1, pt_i(d_i) / pd_i(d_i)); at the first
    rejection sample from the residual normalize(max(pt - pd, 0)); if all
    k drafts survive, sample the bonus token from pt_k.  The resulting
    token stream is distributed EXACTLY as target-only sampling.

    Returns (m [n] int32 — accepted draft count, final [n] int32 — the
    correction/bonus token emitted after the m accepted drafts)."""
    n, k = drafts.shape
    k_acc, k_fin = jax.random.split(key)
    pt_d = jnp.take_along_axis(
        pt[:, :k], drafts[..., None], axis=-1
    )[..., 0]  # [n, k] target prob of each draft
    pd_d = jnp.take_along_axis(
        draft_probs, drafts[..., None], axis=-1
    )[..., 0]
    u = jax.random.uniform(k_acc, (n, k))
    # accept_i  <=>  u < pt/pd  (pd == 0 can't occur for a sampled token,
    # but guard anyway: then accept iff pt > 0).
    accept = u * jnp.maximum(pd_d, 1e-38) < pt_d
    m = jnp.sum(
        jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1
    ).astype(jnp.int32)  # leading-accept count

    # Distribution for the final token: residual at the first rejection,
    # or pt_k when everything was accepted.  Padding draft_probs with a
    # zero row at index k makes max(pt - pd, 0) cover both cases.
    pd_pad = jnp.concatenate(
        [draft_probs, jnp.zeros_like(pt[:, :1])], axis=1
    )  # [n, k+1, V]
    pt_m = jnp.take_along_axis(pt, m[:, None, None], axis=1)[:, 0]
    pd_m = jnp.take_along_axis(pd_pad, m[:, None, None], axis=1)[:, 0]
    residual = jnp.maximum(pt_m - pd_m, 0.0)
    norm = jnp.sum(residual, axis=-1, keepdims=True)
    # Degenerate residual (pt == pd exactly): fall back to pt itself.
    residual = jnp.where(norm > 0.0, residual, pt_m)
    final = jax.random.categorical(
        k_fin, jnp.log(jnp.maximum(residual, 1e-38)), axis=-1
    ).astype(jnp.int32)
    return m, final
