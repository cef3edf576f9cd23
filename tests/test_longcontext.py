"""Long-context checks: the chunked oracle equals the materialized oracle,
and FA2 runs a long sequence (the TPU extension beyond the reference's
S=4096 ceiling, SURVEY.md §5 long-context note)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.kernels.attention import flash_attention
from cuda_flash_attention_tpu.ops.reference import (
    vanilla_attention,
    vanilla_attention_chunked,
)


@pytest.mark.parametrize("causal", [False, True])
def test_chunked_oracle_matches_materialized(causal):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (1, 2, 700, 64), jnp.float32) for kk in ks)
    o1 = vanilla_attention(q, k, v, causal=causal)
    o2 = vanilla_attention_chunked(q, k, v, causal=causal, chunk=256)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-6)


def test_fa2_long_context_8k():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (
        jax.random.normal(kk, (1, 2, 8192, 64), jnp.float32) for kk in ks
    )
    o = flash_attention(q, k, v, causal=True)
    o_ref = vanilla_attention_chunked(q, k, v, causal=True, chunk=512)
    err = float(jnp.max(jnp.abs(o - o_ref)))
    assert err < 1e-5, err
    assert not bool(jnp.any(jnp.isnan(o)))
