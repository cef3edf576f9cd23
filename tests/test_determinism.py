"""Bitwise-determinism regression tests (SURVEY.md §5).

The TPU backward is deterministic BY CONSTRUCTION: the fused kernel emits dq
as per-KV-slice partials reduced by XLA in a fixed order, and the two-kernel
path accumulates dq/dkv in VMEM scratch sequentially — there is no analog of
the reference's cross-block `atomicAdd` dQ accumulation
(/root/reference/kernels/f-attn2-backward.cu:269-300), whose float-add
ordering varies run to run.  These tests pin that advantage: the SAME input
must produce BITWISE-identical gradients on every run, for both backward
paths, both tile dtypes, and the ring (context-parallel) backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.kernels.attention import (
    BlockSizes,
    flash_attention,
)

cpu_count = len(jax.devices("cpu"))
needs8 = pytest.mark.skipif(cpu_count < 8, reason="needs 8 virtual CPU devices")


def _qkv(b=1, h=2, s=256, d=64, seed=7):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (b, h, s, d), jnp.float32) for k in ks)


def _grads_once(block_sizes, tile_dtype, s=256):
    q, k, v = _qkv(s=s)

    def loss(q, k, v):
        o = flash_attention(
            q, k, v, causal=True, block_sizes=block_sizes,
            tile_dtype=tile_dtype, force_kernel=True,
        )
        return jnp.sum(o * o)

    dq, dk, dv = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    return (np.asarray(dq), np.asarray(dk), np.asarray(dv))


@pytest.mark.parametrize("tile_dtype", [None, jnp.bfloat16])
def test_fused_backward_bitwise_deterministic(tile_dtype):
    # Default blocks at S=256 -> 1 KV slice -> fused backward path.
    a = _grads_once(None, tile_dtype)
    b = _grads_once(None, tile_dtype)
    for x, y, name in zip(a, b, ("dq", "dk", "dv")):
        np.testing.assert_array_equal(x, y, err_msg=f"{name} not bitwise equal")


@pytest.mark.parametrize("tile_dtype", [None, jnp.bfloat16])
def test_split_backward_bitwise_deterministic(tile_dtype):
    # 128-sized KV blocks at S=2048 -> 16 slices > _FUSED_BWD_MAX_KV_SLICES
    # -> two-kernel (dq + dkv) path.
    bs = BlockSizes(
        block_q=128, block_k=128, block_q_dkv=128, block_k_dkv=128,
        block_q_dq=128, block_k_dq=128,
    )
    a = _grads_once(bs, tile_dtype, s=2048)
    b = _grads_once(bs, tile_dtype, s=2048)
    for x, y, name in zip(a, b, ("dq", "dk", "dv")):
        np.testing.assert_array_equal(x, y, err_msg=f"{name} not bitwise equal")


@pytest.mark.quick
def test_forward_bitwise_deterministic():
    q, k, v = _qkv()
    fn = jax.jit(
        lambda q, k, v: flash_attention(q, k, v, force_kernel=True)
    )
    np.testing.assert_array_equal(np.asarray(fn(q, k, v)), np.asarray(fn(q, k, v)))


@needs8
def test_ring_backward_bitwise_deterministic():
    from cuda_flash_attention_tpu.parallel import make_device_mesh, ring_attention
    from cuda_flash_attention_tpu.parallel.mesh import cpu_test_mesh

    mesh = cpu_test_mesh({"ctx": 4})
    q, k, v = _qkv(b=1, h=2, s=512)

    def run():
        def loss(q, k, v):
            return jnp.sum(ring_attention(mesh, q, k, v, causal=True) ** 2)

        dq, dk, dv = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
        return (np.asarray(dq), np.asarray(dk), np.asarray(dv))

    for x, y, name in zip(run(), run(), ("dq", "dk", "dv")):
        np.testing.assert_array_equal(x, y, err_msg=f"ring {name} not bitwise equal")
