"""Token sampling for the decode engine: greedy, temperature, top-k.

Pure-jnp, static-shaped (top-k uses lax.top_k with a static k) so the whole
sample step fuses into the decode jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=("temperature", "top_k", "top_p")
)
def sample_tokens(
    logits,       # [num_seqs, vocab]
    key,          # PRNG key
    *,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
):
    """Sample one token per row. temperature<=0 -> greedy; top_k>0 restricts
    to the k most likely tokens; top_p<1 restricts to the smallest nucleus
    whose probability mass reaches p (static-shaped: sort + cumsum)."""
    if not 0.0 < top_p <= 1.0:
        raise ValueError(
            f"top_p must be in (0, 1]; got {top_p} (use temperature=0 for "
            "greedy decoding)"
        )
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
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
        vals, idx = jax.lax.top_k(logits, top_k)  # [n, k]
        choice = jax.random.categorical(key, vals, axis=-1)  # [n]
        return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(
            jnp.int32
        )
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
