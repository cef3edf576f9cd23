"""Segment-ids (sequence packing / padding mask) tests: kernel vs oracle
forward and gradients, packing equivalence, fully-masked padding rows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.kernels.attention import flash_attention
from cuda_flash_attention_tpu.ops.reference import vanilla_attention


def _qkv(b=2, h=2, s=256, d=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(
        jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks
    )


def _segments(b, s, n_seg=3, seed=1):
    """Contiguous random segment partition of each row."""
    rng = np.random.default_rng(seed)
    out = np.zeros((b, s), np.int32)
    for i in range(b):
        cuts = np.sort(rng.choice(np.arange(1, s), n_seg - 1, replace=False))
        prev, sid = 0, 0
        for c in list(cuts) + [s]:
            out[i, prev:c] = sid
            prev, sid = c, sid + 1
    return jnp.asarray(out)


@pytest.mark.parametrize("causal", [False, True])
def test_segment_forward_matches_oracle(causal):
    q, k, v = _qkv()
    seg = _segments(2, 256)
    o = flash_attention(
        q, k, v, causal=causal, q_segment_ids=seg, kv_segment_ids=seg,
        force_kernel=True,
    )
    o_ref = vanilla_attention(
        q, k, v, causal=causal, q_segment_ids=seg, kv_segment_ids=seg
    )
    err = float(jnp.max(jnp.abs(o - o_ref)))
    assert err < 1e-5, err
    assert not bool(jnp.any(jnp.isnan(o)))


def test_segment_grads_match_oracle():
    q, k, v = _qkv(s=128)
    seg = _segments(2, 128, n_seg=2)
    w = jax.random.normal(jax.random.PRNGKey(5), q.shape, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(flash_attention(
            q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg,
            force_kernel=True,
        ) * w)

    def loss_ref(q, k, v):
        return jnp.sum(vanilla_attention(
            q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg
        ) * w)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, ref, name in zip(g, g_ref, ("dq", "dk", "dv")):
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 5e-4, f"{name}: {err}"
        assert not bool(jnp.any(jnp.isnan(got)))


def test_packing_equals_separate_sequences():
    """Two sequences packed into one row with segment ids must equal the two
    attention calls run separately."""
    b, h, s1, s2, d = 1, 2, 100, 156, 64
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, h, s1 + s2, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s1 + s2, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s1 + s2, d), jnp.float32)
    seg = jnp.asarray([[0] * s1 + [1] * s2], jnp.int32)
    o = flash_attention(
        q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg,
        force_kernel=True,
    )
    o1 = flash_attention(q[:, :, :s1], k[:, :, :s1], v[:, :, :s1],
                         causal=True, force_kernel=True)
    o2 = flash_attention(q[:, :, s1:], k[:, :, s1:], v[:, :, s1:],
                         causal=True, force_kernel=True)
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(jnp.concatenate([o1, o2], axis=2)),
        atol=2e-5,
    )


def test_fully_masked_padding_rows_are_zero():
    """Padding tokens (segment id matching no KV) produce O = 0 and zero
    gradient contribution to real tokens' dK/dV."""
    q, k, v = _qkv(b=1, h=1, s=128)
    q_seg = jnp.asarray([[0] * 100 + [-7] * 28], jnp.int32)  # 28 pad rows
    kv_seg = jnp.asarray([[0] * 100 + [-8] * 28], jnp.int32)
    o = flash_attention(
        q, k, v, q_segment_ids=q_seg, kv_segment_ids=kv_seg,
        force_kernel=True,
    )
    np.testing.assert_array_equal(np.asarray(o[0, 0, 100:]), 0.0)
    assert not bool(jnp.any(jnp.isnan(o)))

    def loss(k):
        return jnp.sum(flash_attention(
            q, k, v, q_segment_ids=q_seg, kv_segment_ids=kv_seg,
            force_kernel=True,
        ))

    dk = jax.grad(loss)(k)
    assert not bool(jnp.any(jnp.isnan(dk)))
    # Gradient w.r.t. padding KV positions is exactly zero.
    np.testing.assert_array_equal(np.asarray(dk[0, 0, 100:]), 0.0)


@pytest.mark.parametrize("causal", [False, True])
def test_segments_small_packed_kernel(causal):
    """Small shapes route to the head-PACKED kernel (several heads attend in
    one block-diagonal matmul per grid cell): segment masking must compose
    with the same-head mask, and heads must stay isolated."""
    q, k, v = _qkv(b=2, h=8, s=64, seed=3)  # group=8 -> one packed cell
    seg = _segments(2, 64, n_seg=2)
    o = flash_attention(
        q, k, v, causal=causal, q_segment_ids=seg, kv_segment_ids=seg,
        force_kernel=True,
    )
    o_ref = vanilla_attention(
        q, k, v, causal=causal, q_segment_ids=seg, kv_segment_ids=seg
    )
    err = float(jnp.max(jnp.abs(o - o_ref)))
    assert err < 1e-5, err


@pytest.mark.quick
def test_segments_xla_path():
    """Small fp32 shapes route to the XLA path; segments must work there too."""
    q, k, v = _qkv(b=1, h=1, s=128)
    seg = _segments(1, 128, n_seg=2)
    o_routed = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)
    o_ref = vanilla_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)
    np.testing.assert_allclose(np.asarray(o_routed), np.asarray(o_ref),
                               atol=1e-6)


@pytest.mark.quick
def test_segment_validation():
    q, k, v = _qkv(s=128)
    seg = _segments(2, 128)
    with pytest.raises(ValueError, match="together"):
        flash_attention(q, k, v, q_segment_ids=seg)
    with pytest.raises(ValueError, match="q_segment_ids"):
        flash_attention(q, k, v, q_segment_ids=seg[:, :64],
                        kv_segment_ids=seg)
