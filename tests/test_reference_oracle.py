"""Sanity checks for the pure-JAX oracle itself."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from cuda_flash_attention_tpu.ops.reference import (
    vanilla_attention_with_lse,
    reference_attention_grads,
)


@pytest.mark.quick
def test_oracle_matches_naive_numpy():
    rng = np.random.default_rng(0)
    b, h, s, d = 1, 2, 64, 32
    q = rng.standard_normal((b, h, s, d), dtype=np.float32)
    k = rng.standard_normal((b, h, s, d), dtype=np.float32)
    v = rng.standard_normal((b, h, s, d), dtype=np.float32)
    scale = 1.0 / np.sqrt(d)
    s_mat = np.einsum("bhqd,bhkd->bhqk", q, k).astype(np.float64) * scale
    p = np.exp(s_mat - s_mat.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    o_np = np.einsum("bhqk,bhkd->bhqd", p, v.astype(np.float64))
    o, lse = vanilla_attention_with_lse(jnp.array(q), jnp.array(k), jnp.array(v))
    np.testing.assert_allclose(np.asarray(o), o_np, atol=2e-5)
    lse_np = np.log(np.exp(s_mat - s_mat.max(-1, keepdims=True)).sum(-1)) + s_mat.max(-1)
    np.testing.assert_allclose(np.asarray(lse), lse_np, atol=2e-4)


def test_oracle_causal_masks_future():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 1, 8, 16))
    k = jax.random.normal(key, (1, 1, 8, 16))
    v = jax.random.normal(key, (1, 1, 8, 16))
    o_causal, _ = vanilla_attention_with_lse(q, k, v, causal=True)
    # Row 0 attends only to position 0 -> output equals v[0].
    np.testing.assert_allclose(
        np.asarray(o_causal[0, 0, 0]), np.asarray(v[0, 0, 0]), rtol=1e-6
    )


def test_oracle_grads_shapes():
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (1, 2, 32, 16))
    dq, dk, dv = reference_attention_grads(q, q, q)
    assert dq.shape == dk.shape == dv.shape == q.shape
    assert np.isfinite(np.asarray(dq)).all()


# ---------------------------------------------------------------------------
# Independent second oracle (jax.nn SDPA) — the reference cross-checks two
# independently-written implementations (torch CPU vs torch-GPU math SDPA,
# test_flash_attention2.py:197-218); these tests are the oracle-bug detector.
# ---------------------------------------------------------------------------

from cuda_flash_attention_tpu.ops.reference import (  # noqa: E402
    sdpa_attention,
    sdpa_attention_grads,
)


@pytest.mark.quick
@pytest.mark.parametrize("causal", [False, True])
def test_two_oracles_agree_forward(causal):
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (2, 4, 96, 64), jnp.float32)
    k = jax.random.normal(ks[1], (2, 4, 96, 64), jnp.float32)
    v = jax.random.normal(ks[2], (2, 4, 96, 64), jnp.float32)
    o1 = vanilla_attention_with_lse(q, k, v, causal=causal)[0]
    o2 = sdpa_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)


def test_two_oracles_agree_grads():
    ks = jax.random.split(jax.random.PRNGKey(8), 3)
    q = jax.random.normal(ks[0], (1, 2, 64, 64), jnp.float32)
    k = jax.random.normal(ks[1], (1, 2, 64, 64), jnp.float32)
    v = jax.random.normal(ks[2], (1, 2, 64, 64), jnp.float32)
    g1 = reference_attention_grads(q, k, v)
    g2 = sdpa_attention_grads(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_chunked_oracle_grads_and_lse_match_full(causal):
    """The checkpointed chunked oracle (long-context path) must reproduce
    the full oracle's forward, lse, and gradients at small scale."""
    from cuda_flash_attention_tpu.ops.reference import (
        vanilla_attention_chunked,
        vanilla_attention_with_lse,
    )

    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q, k, v = (
        jax.random.normal(kk, (2, 4, 160, 64), jnp.float32) for kk in ks
    )
    o_full, lse_full = vanilla_attention_with_lse(q, k, v, causal=causal)
    o_c, lse_c = vanilla_attention_chunked(
        q, k, v, causal=causal, chunk=64, return_lse=True
    )
    np.testing.assert_allclose(
        np.asarray(o_c), np.asarray(o_full), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(lse_c), np.asarray(lse_full), atol=2e-5, rtol=1e-6
    )
    g_full = reference_attention_grads(q, k, v, causal=causal)
    g_c = reference_attention_grads(q, k, v, causal=causal, chunked=True)
    for a, b in zip(g_full, g_c):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-6
        )
