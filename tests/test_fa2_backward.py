"""FA2 backward (dQ/dK/dV) vs autodiff oracle.

Mirrors the reference harness's gradient comparison
(/root/reference/test_flash_attention2.py:608-794): concatenated [dQ|dK|dV]
against the autograd oracle with simulated loss L = sum(O) (dO = 1), plus the
both-mode contract — kernel forward's logsumexp feeding the kernel backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu import flash_attention, flash_attention_with_lse
from cuda_flash_attention_tpu.kernels.attention import fa2_backward
from cuda_flash_attention_tpu.ops.metrics import compute_metrics
from cuda_flash_attention_tpu.ops.reference import (
    reference_attention_grads,
    vanilla_attention,
)


def make_qkv(batch, heads, seq, d, seed=42):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (batch, heads, seq, d)
    return (
        jax.random.uniform(k1, shape, jnp.float32),
        jax.random.uniform(k2, shape, jnp.float32),
        jax.random.uniform(k3, shape, jnp.float32),
    )


CONFIGS = [
    ("Small", 1, 2, 128, 64),
    ("Medium", 2, 4, 512, 64),
    ("Edge-NonPowerOf2", 1, 2, 100, 64),
    ("Edge-SmallSeq", 1, 2, 32, 64),
    ("HeadDim-32", 1, 2, 256, 32),
]


@pytest.mark.parametrize("name,b,h,s,d", CONFIGS, ids=[c[0] for c in CONFIGS])
@pytest.mark.parametrize("causal", [False, True], ids=["full", "causal"])
def test_grads_match_autodiff_oracle(name, b, h, s, d, causal):
    q, k, v = make_qkv(b, h, s, d)
    dq_ref, dk_ref, dv_ref = reference_attention_grads(q, k, v, causal=causal)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal))

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for nm, got, ref in [("dQ", dq, dq_ref), ("dK", dk, dk_ref), ("dV", dv, dv_ref)]:
        m = compute_metrics(got, ref)
        assert m.passes(1e-3), f"{name} {nm}: {m}"
        assert m.max_abs_error < 1e-4, f"{name} {nm}: {m}"


def test_both_mode_kernel_lse_feeds_kernel_backward():
    # The save-for-backward contract end-to-end (SURVEY.md §3.4): kernel
    # forward's (O, logsumexp) drive the standalone kernel backward.
    q, k, v = make_qkv(2, 4, 256, 64)
    o, lse = flash_attention_with_lse(q, k, v)
    dq, dk, dv = fa2_backward(q, k, v, o, lse)  # dO defaults to ones
    dq_ref, dk_ref, dv_ref = reference_attention_grads(q, k, v)
    got = np.concatenate([np.asarray(x).ravel() for x in (dq, dk, dv)])
    ref = np.concatenate([np.asarray(x).ravel() for x in (dq_ref, dk_ref, dv_ref)])
    m = compute_metrics(got, ref)
    assert m.passes(1e-3), f"{m}"


def test_backward_from_reference_forward_artifacts():
    # Reference "--mode backward" quirk (SURVEY.md §3.5): forward artifacts
    # come from the *oracle*, not the kernel.
    from cuda_flash_attention_tpu.ops.reference import vanilla_attention_with_lse

    q, k, v = make_qkv(1, 2, 384, 64, seed=7)
    o_ref, lse_ref = vanilla_attention_with_lse(q, k, v)
    dq, dk, dv = fa2_backward(q, k, v, o_ref, lse_ref)
    dq_ref, dk_ref, dv_ref = reference_attention_grads(q, k, v)
    assert compute_metrics(dq, dq_ref).passes(1e-3)
    assert compute_metrics(dk, dk_ref).passes(1e-3)
    assert compute_metrics(dv, dv_ref).passes(1e-3)


@pytest.mark.quick
def test_custom_do():
    q, k, v = make_qkv(1, 2, 128, 64, seed=3)
    do = jax.random.normal(jax.random.PRNGKey(9), q.shape)
    dq_ref, dk_ref, dv_ref = reference_attention_grads(q, k, v, do)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v) * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert compute_metrics(dq, dq_ref).max_abs_error < 1e-4
    assert compute_metrics(dk, dk_ref).max_abs_error < 1e-4
    assert compute_metrics(dv, dv_ref).max_abs_error < 1e-4


def test_grads_reduced_precision_tiles():
    q, k, v = make_qkv(1, 2, 256, 64)
    dq_ref, dk_ref, dv_ref = reference_attention_grads(q, k, v)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, tile_dtype=jnp.bfloat16))

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    # bf16 tiles: looser budget, same shape as the reference's fp16-SHM gate.
    assert compute_metrics(dq, dq_ref).passes(5e-2)
    assert compute_metrics(dk, dk_ref).passes(5e-2)
    assert compute_metrics(dv, dv_ref).passes(5e-2)


def test_value_and_grad_consistency():
    q, k, v = make_qkv(1, 1, 128, 64, seed=11)
    o_direct = flash_attention(q, k, v)
    o_vjp, _ = jax.vjp(lambda a, b, c: flash_attention(a, b, c), q, k, v)
    np.testing.assert_array_equal(np.asarray(o_direct), np.asarray(o_vjp))
    o_ref = vanilla_attention(q, k, v)
    assert compute_metrics(o_vjp, o_ref).max_abs_error < 2e-6


def test_grads_head_dim_256():
    """head_dim=256 is advertised in SUPPORTED_HEAD_DIMS
    (dispatch/registry.py) — exercise the full backward at that width
    (two 128-lane tiles per head)."""
    q, k, v = make_qkv(1, 2, 256, 256, seed=21)
    dq_ref, dk_ref, dv_ref = reference_attention_grads(q, k, v)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v))

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert compute_metrics(dq, dq_ref).passes(1e-3)
    assert compute_metrics(dk, dk_ref).passes(1e-3)
    assert compute_metrics(dv, dv_ref).passes(1e-3)


def test_grads_fp16_tiles():
    """fp16-tile backward (the reference fp16-SHM analog,
    /root/reference/kernels/f-attn2-backward_f16.cu): storage-rounding
    emulation keeps compute fp32, so the budget is ~10-bit-mantissa tight
    (measured 5.7e-4) — far tighter than bf16's 5e-2 gate."""
    q, k, v = make_qkv(1, 2, 256, 64, seed=22)
    dq_ref, dk_ref, dv_ref = reference_attention_grads(q, k, v)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, tile_dtype=jnp.float16))

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert compute_metrics(dq, dq_ref).passes(5e-3)
    assert compute_metrics(dk, dk_ref).passes(5e-3)
    assert compute_metrics(dv, dv_ref).passes(5e-3)
