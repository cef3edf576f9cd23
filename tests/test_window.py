"""Sliding-window (local) attention tests.

Window semantics: query i attends to keys j with j <= i and i - j < window
(Mistral-style local attention; requires causal).  Oracle: the materialized
vanilla path with the same window mask.  The kernel must match on the
forward, the gradients, GQA, segment packing, and ragged (non-block-aligned)
lengths — and window >= S must be bit-identical to plain causal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.kernels.attention import flash_attention
from cuda_flash_attention_tpu.kernels.common import BlockSizes
from cuda_flash_attention_tpu.ops.reference import vanilla_attention


def _qkv(s, b=1, h=2, d=64, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), dtype)
    k = jax.random.normal(ks[1], (b, h, s, d), dtype)
    v = jax.random.normal(ks[2], (b, h, s, d), dtype)
    return q, k, v


# Small blocks force multi-block grids at test-sized S, exercising the
# window tile-skip (dead old KV blocks) and the partial diagonal tiles.
_BS = BlockSizes(
    block_q=128, block_k=128, block_q_dkv=128, block_k_dkv=128,
    block_q_dq=128, block_k_dq=128,
)


@pytest.mark.quick
@pytest.mark.parametrize("s,window", [(512, 128), (512, 200), (384, 1)])
def test_window_forward_matches_oracle(s, window):
    q, k, v = _qkv(s)
    o = flash_attention(
        q, k, v, causal=True, window=window, block_sizes=_BS,
        force_kernel=True,
    )
    o_ref = vanilla_attention(q, k, v, causal=True, window=window)
    err = float(jnp.max(jnp.abs(o - o_ref)))
    assert err < 1e-5, err


def test_window_xla_route_matches_oracle():
    # Small fp32 shapes dispatch to the fused-XLA path; the window must
    # apply there too.
    q, k, v = _qkv(256)
    o = flash_attention(q, k, v, causal=True, window=100)
    o_ref = vanilla_attention(q, k, v, causal=True, window=100)
    assert float(jnp.max(jnp.abs(o - o_ref))) < 1e-6


def test_window_ge_seq_equals_causal():
    q, k, v = _qkv(256)
    o_win = flash_attention(
        q, k, v, causal=True, window=256, block_sizes=_BS, force_kernel=True
    )
    o_causal = flash_attention(
        q, k, v, causal=True, block_sizes=_BS, force_kernel=True
    )
    np.testing.assert_array_equal(np.asarray(o_win), np.asarray(o_causal))


def test_window_ragged_seq():
    # Non-block-aligned S: tail masking composes with the window mask.
    q, k, v = _qkv(300)
    o = flash_attention(
        q, k, v, causal=True, window=90, block_sizes=_BS, force_kernel=True
    )
    o_ref = vanilla_attention(q, k, v, causal=True, window=90)
    assert float(jnp.max(jnp.abs(o - o_ref))) < 1e-5


@pytest.mark.quick
@pytest.mark.parametrize("window", [128, 200])
def test_window_grads_match_oracle(window):
    s = 512
    q, k, v = _qkv(s)
    w = jax.random.normal(jax.random.PRNGKey(7), q.shape, jnp.float32)

    def loss(q, k, v):
        o = flash_attention(
            q, k, v, causal=True, window=window, block_sizes=_BS,
            force_kernel=True,
        )
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        return jnp.sum(vanilla_attention(q, k, v, causal=True, window=window) * w)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, g_ref, name in zip(grads, grads_ref, "q k v".split()):
        err = float(jnp.max(jnp.abs(g - g_ref)))
        assert err < 1e-4, f"d{name}: {err}"


def test_window_gqa():
    s, hq, hkv = 512, 4, 2
    q, _, _ = _qkv(s, h=hq, seed=1)
    _, k, v = _qkv(s, h=hkv, seed=2)
    o = flash_attention(
        q, k, v, causal=True, window=160, block_sizes=_BS, force_kernel=True
    )
    o_ref = vanilla_attention(
        q, jnp.repeat(k, hq // hkv, axis=1), jnp.repeat(v, hq // hkv, axis=1),
        causal=True, window=160,
    )
    assert float(jnp.max(jnp.abs(o - o_ref))) < 1e-5


def test_window_with_segments():
    # Sequence packing composes: the window applies WITHIN the causal+segment
    # mask (positions are global, as in packed training with windowed layers).
    s = 384
    q, k, v = _qkv(s)
    seg = (jnp.arange(s) >= 192).astype(jnp.int32)[None, :]
    o = flash_attention(
        q, k, v, causal=True, window=100,
        q_segment_ids=seg, kv_segment_ids=seg,
        block_sizes=_BS, force_kernel=True,
    )
    from cuda_flash_attention_tpu.ops.reference import vanilla_attention as va
    o_ref = va(
        q, k, v, causal=True, window=100,
        q_segment_ids=seg, kv_segment_ids=seg,
    )
    assert float(jnp.max(jnp.abs(o - o_ref))) < 1e-5


def test_window_bf16_tiles():
    q, k, v = _qkv(512, dtype=jnp.bfloat16)
    o = flash_attention(
        q, k, v, causal=True, window=130, block_sizes=_BS,
        tile_dtype=jnp.bfloat16, force_kernel=True,
    )
    o_ref = vanilla_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=True, window=130,
    )
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - o_ref)))
    assert err < 5e-2, err


def test_window_without_causal_is_recency_band():
    # causal=False + window = recency band (keys j > i - window, future
    # unrestricted) — the per-shard mode ring attention decomposes into.
    q, k, v = _qkv(384)
    o = flash_attention(
        q, k, v, causal=False, window=100, block_sizes=_BS, force_kernel=True
    )
    o_ref = vanilla_attention(q, k, v, causal=False, window=100)
    assert float(jnp.max(jnp.abs(o - o_ref))) < 1e-5


def test_window_rejects_nonpositive():
    q, k, v = _qkv(128)
    with pytest.raises(ValueError, match="window"):
        flash_attention(q, k, v, causal=True, window=0)


# ---------------------------------------------------------------------------
# Model-level wiring: TransformerConfig.attn_window / global_every.
# ---------------------------------------------------------------------------


def test_layer_window_pattern():
    from cuda_flash_attention_tpu.models.transformer import TransformerConfig

    cfg = TransformerConfig.tiny()
    cfg = __import__("dataclasses").replace(cfg, attn_window=64, global_every=2)
    assert [cfg.layer_window(i) for i in range(4)] == [64, None, 64, None]
    cfg_all = __import__("dataclasses").replace(cfg, global_every=0)
    assert [cfg_all.layer_window(i) for i in range(2)] == [64, 64]
    cfg_none = __import__("dataclasses").replace(cfg, attn_window=None)
    assert cfg_none.layer_window(0) is None


def test_transformer_windowed_forward_and_grads():
    import dataclasses

    from cuda_flash_attention_tpu.models.transformer import (
        TransformerConfig, init_params, loss_fn,
    )

    base = TransformerConfig.tiny()
    cfg = dataclasses.replace(base, attn_window=32, global_every=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0,
                                cfg.vocab_size)
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, cfg)
    assert bool(jnp.isfinite(loss))
    assert all(bool(jnp.isfinite(g).all()) for g in jax.tree.leaves(grads))

    # A window >= S is folded away: bit-identical to the global model.
    cfg_big = dataclasses.replace(base, attn_window=100_000)
    loss_big = loss_fn(params, tokens, cfg_big)
    loss_global = loss_fn(params, tokens, base)
    np.testing.assert_array_equal(np.asarray(loss_big), np.asarray(loss_global))
    # A real window changes the forward (sanity that the plumbing is live).
    assert float(loss) != float(loss_global)


def test_window_head_parallel_mesh():
    from jax.sharding import Mesh

    from cuda_flash_attention_tpu.parallel.sharded import (
        head_parallel_attention,
    )

    devs = np.array(jax.devices("cpu")[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "model"))
    q, k, v = _qkv(256, b=2, h=4)
    o = head_parallel_attention(mesh, q, k, v, causal=True, window=96)
    o_ref = vanilla_attention(q, k, v, causal=True, window=96)
    assert float(jnp.max(jnp.abs(o - o_ref))) < 1e-5


def test_window_quantized_kv():
    """Quantized-KV forward with a window == dequantized oracle with the
    same mask (int8 round-trip isolated by attending over the round-tripped
    K/V)."""
    from cuda_flash_attention_tpu.kernels.fa2_forward_quant import (
        flash_attention_quantized_kv,
    )
    from cuda_flash_attention_tpu.quant import quantize_kv

    s = 512
    q, k, v = _qkv(s, h=4)
    k_q, v_q = quantize_kv(k, v, jnp.int8)
    o = flash_attention_quantized_kv(
        q, k_q, v_q, causal=True, window=160,
        block_q=128, block_k=128, compute_dtype=jnp.float32,
    )
    k_rt = (k_q.values.astype(jnp.float32) * k_q.scales)
    v_rt = (v_q.values.astype(jnp.float32) * v_q.scales)
    o_ref = vanilla_attention(q, k_rt, v_rt, causal=True, window=160)
    err = float(jnp.max(jnp.abs(o - o_ref)))
    assert err < 1e-5, err


# ---------------------------------------------------------------------------
# Ring (context-parallel) sliding window: global window decomposed into the
# windowed-causal diagonal step + per-shard recency bands; out-of-window
# rotations are skipped entirely.
# ---------------------------------------------------------------------------

needs8 = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs 8 virtual CPU devices"
)


def _ring_qkv(s, b=1, h=2, d=64, seed=5):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (b, h, s, d), jnp.float32) for k in ks)


@needs8
@pytest.mark.parametrize("window", [1, 100, 200, 450])
def test_ring_window_forward_matches_oracle(window):
    from cuda_flash_attention_tpu.parallel import ring_attention
    from cuda_flash_attention_tpu.parallel.mesh import cpu_test_mesh

    mesh = cpu_test_mesh({"ctx": 4})
    q, k, v = _ring_qkv(512)  # 128-token shards
    o = ring_attention(mesh, q, k, v, causal=True, window=window)
    o_ref = vanilla_attention(q, k, v, causal=True, window=window)
    err = float(jnp.max(jnp.abs(np.asarray(o) - o_ref)))
    assert err < 2e-5, f"window={window}: {err}"


@needs8
def test_ring_window_ge_seq_equals_causal():
    from cuda_flash_attention_tpu.parallel import ring_attention
    from cuda_flash_attention_tpu.parallel.mesh import cpu_test_mesh

    mesh = cpu_test_mesh({"ctx": 4})
    q, k, v = _ring_qkv(512, seed=6)
    o_win = ring_attention(mesh, q, k, v, causal=True, window=10_000)
    o_causal = ring_attention(mesh, q, k, v, causal=True)
    np.testing.assert_array_equal(np.asarray(o_win), np.asarray(o_causal))


@needs8
@pytest.mark.slow
def test_ring_window_grads_match_oracle():
    from cuda_flash_attention_tpu.parallel import ring_attention
    from cuda_flash_attention_tpu.parallel.mesh import cpu_test_mesh

    mesh = cpu_test_mesh({"ctx": 4})
    q, k, v = _ring_qkv(512, seed=7)
    w = jax.random.normal(jax.random.PRNGKey(8), q.shape, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(
            ring_attention(mesh, q, k, v, causal=True, window=150) * w
        )

    def loss_ref(q, k, v):
        return jnp.sum(vanilla_attention(q, k, v, causal=True, window=150) * w)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, g_ref, name in zip(grads, grads_ref, "q k v".split()):
        err = float(jnp.max(jnp.abs(np.asarray(g) - g_ref)))
        assert err < 1e-4, f"d{name}: {err}"


@needs8
@pytest.mark.slow
def test_ring_window_quantized():
    from cuda_flash_attention_tpu.parallel.mesh import cpu_test_mesh
    from cuda_flash_attention_tpu.parallel.ring import ring_attention_quantized

    mesh = cpu_test_mesh({"ctx": 4})
    q, k, v = _ring_qkv(512, seed=9)
    o = ring_attention_quantized(
        mesh, q, k, v, causal=True, window=200, compute_dtype=jnp.float32,
    )
    o_ref = vanilla_attention(q, k, v, causal=True, window=200)
    err = float(jnp.max(jnp.abs(np.asarray(o) - o_ref)))
    assert err < 5e-2, err  # includes the int8 KV round trip
