"""Kernel-native GQA tests: query heads share KV heads via BlockSpec index
maps (no repeated-KV materialization).  Oracle: the same attention computed
with explicitly repeated K/V; gradients must match including the dK/dV
group-sum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.kernels.attention import flash_attention
from cuda_flash_attention_tpu.ops.reference import vanilla_attention


def _qkv(hq, hkv, s=256, b=2, d=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, hq, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.float32)
    return q, k, v


def _expand(x, groups):
    return jnp.repeat(x, groups, axis=1)


@pytest.mark.parametrize("hq,hkv", [(8, 2), (4, 4), (4, 1)])
@pytest.mark.parametrize("causal", [False, True])
def test_gqa_forward_matches_repeated_oracle(hq, hkv, causal):
    q, k, v = _qkv(hq, hkv)
    g = hq // hkv
    o = flash_attention(q, k, v, causal=causal)
    o_ref = vanilla_attention(q, _expand(k, g), _expand(v, g), causal=causal)
    err = float(jnp.max(jnp.abs(o - o_ref)))
    assert err < 1e-5, err


@pytest.mark.parametrize("causal", [False, True])
def test_gqa_grads_match_repeated_oracle(causal):
    """dK/dV for a KV head must equal the sum of the repeated-oracle grads
    over its query-head group."""
    hq, hkv = 8, 2
    g = hq // hkv
    q, k, v = _qkv(hq, hkv, s=128)
    w = jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal) * w)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, ke, ve):
        return jnp.sum(vanilla_attention(q, ke, ve, causal=causal) * w)

    dq_r, dke, dve = jax.grad(loss_ref, argnums=(0, 1, 2))(
        q, _expand(k, g), _expand(v, g)
    )
    b, _, s, d = q.shape
    dk_r = dke.reshape(b, hkv, g, s, d).sum(axis=2)
    dv_r = dve.reshape(b, hkv, g, s, d).sum(axis=2)
    for got, ref, name in [(dq, dq_r, "dq"), (dk, dk_r, "dk"), (dv, dv_r, "dv")]:
        # fp32 accumulation-order noise on grads of magnitude ~10; a
        # group-sum algebra bug would be O(1). Reference gate is 1e-3.
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 5e-4, f"{name}: {err}"


@pytest.mark.quick
def test_gqa_ragged_seq():
    q, k, v = _qkv(4, 2, s=100)  # non-block-multiple
    o = flash_attention(q, k, v, causal=True)
    o_ref = vanilla_attention(q, _expand(k, 2), _expand(v, 2), causal=True)
    assert float(jnp.max(jnp.abs(o - o_ref))) < 1e-5
    assert not bool(jnp.any(jnp.isnan(o)))


def test_gqa_rejects_bad_head_ratio():
    q, k, v = _qkv(6, 4)
    with pytest.raises(ValueError, match="multiple"):
        flash_attention(q, k, v)
