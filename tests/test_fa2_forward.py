"""FA2 forward vs the pure-JAX oracle.

Mirrors the reference harness's tolerance-gated comparison
(/root/reference/test_flash_attention2.py:1018-1020): max_abs_error below
tolerance and no NaN/Inf, over a config matrix that includes the
non-power-of-2 (S=100) and smaller-than-block (S=32) edge cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu import flash_attention, flash_attention_with_lse
from cuda_flash_attention_tpu.kernels.common import BlockSizes
from cuda_flash_attention_tpu.ops.reference import (
    vanilla_attention,
    vanilla_attention_with_lse,
)
from cuda_flash_attention_tpu.ops.metrics import compute_metrics


def make_qkv(batch, heads, seq, d, dtype=jnp.float32, seed=42):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.uniform(k1, (batch, heads, seq, d), dtype=dtype)
    k = jax.random.uniform(k2, (batch, heads, seq, d), dtype=dtype)
    v = jax.random.uniform(k3, (batch, heads, seq, d), dtype=dtype)
    return q, k, v


CONFIGS = [
    # (name, B, H, S, D) — reference config matrix (test_flash_attention2.py:1365-1410)
    ("Small-1", 1, 1, 128, 64),
    ("Small-2", 1, 4, 256, 64),
    ("Medium-1", 2, 8, 512, 64),
    ("Large-1", 4, 8, 1024, 64),
    ("Edge-NonPowerOf2", 2, 4, 100, 64),
    ("Edge-SmallSeq", 2, 4, 32, 64),
    ("HeadDim-32", 2, 4, 256, 32),
    ("HeadDim-128", 2, 4, 256, 128),
    ("HeadDim-256", 1, 2, 256, 256),
]


@pytest.mark.parametrize("name,b,h,s,d", CONFIGS, ids=[c[0] for c in CONFIGS])
@pytest.mark.parametrize("causal", [False, True], ids=["full", "causal"])
def test_forward_matches_oracle(name, b, h, s, d, causal):
    q, k, v = make_qkv(b, h, s, d)
    o_ref, lse_ref = vanilla_attention_with_lse(q, k, v, causal=causal)
    o, lse = flash_attention_with_lse(q, k, v, causal=causal)
    m = compute_metrics(o, o_ref)
    assert m.passes(1e-3), f"{name}: {m}"
    assert m.max_abs_error < 2e-6, f"{name}: {m}"
    lse_m = compute_metrics(lse, lse_ref)
    assert lse_m.passes(1e-3), f"{name} lse: {lse_m}"


def test_forward_differentiable_entry_matches():
    q, k, v = make_qkv(2, 4, 384, 64)
    o = flash_attention(q, k, v)
    o_ref, _ = vanilla_attention_with_lse(q, k, v)
    assert compute_metrics(o, o_ref).max_abs_error < 2e-6


@pytest.mark.parametrize("tile_dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "fp16"])
def test_forward_reduced_precision_tiles(tile_dtype):
    # SHM_PRECISION analog: reduced-precision tiles must stay within the
    # reference's 1e-3 harness tolerance (README gate for the fp16 kernel).
    q, k, v = make_qkv(2, 4, 512, 64)
    o_ref, _ = vanilla_attention_with_lse(q, k, v)
    o = flash_attention(q, k, v, tile_dtype=tile_dtype)
    m = compute_metrics(o, o_ref)
    assert m.passes(2e-2), f"{m}"


def test_cross_attention_lengths():
    # Sq != Skv (decode-like shapes).
    kq, kk, kv_ = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (1, 4, 128, 64))
    k = jax.random.normal(kk, (1, 4, 640, 64))
    v = jax.random.normal(kv_, (1, 4, 640, 64))
    o_ref, _ = vanilla_attention_with_lse(q, k, v)
    o = flash_attention(q, k, v)
    assert compute_metrics(o, o_ref).max_abs_error < 2e-6


def test_determinism():
    # The reference's atomic dQ cannot guarantee this (SURVEY.md §5); ours must.
    q, k, v = make_qkv(1, 2, 256, 64)
    o1 = np.asarray(flash_attention(q, k, v))
    o2 = np.asarray(flash_attention(q, k, v))
    assert (o1 == o2).all()


@pytest.mark.parametrize("head_dim", [128, 256])
def test_forward_chunked_rowsum_path_matches_oracle(head_dim):
    """D >= 128 / S >= 2048 / bf16 takes the in-body 2-chunk KV split
    (_rowsum_chunks — overlaps the exposed rowsum with the next chunk's
    QK^T; round-5 D=128 frontier work).  Accuracy stays inside the bf16
    budget vs the fp32 oracle, with and without causal masking."""
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q, k, v = (
        jax.random.normal(kk, (1, 2, 2048, head_dim), jnp.bfloat16)
        for kk in ks
    )
    for causal in (False, True):
        o = flash_attention(
            q, k, v, causal=causal, force_kernel=True,
            block_sizes=BlockSizes(block_q=2048, block_k=2048),
        )
        ref = vanilla_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), causal=causal,
        )
        err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref)))
        # bf16 online-softmax budget at these depths measures ~9e-3 on the
        # UNchunked grid path too (identical error both paths on CPU).
        assert err < 1.5e-2, (head_dim, causal, err)
