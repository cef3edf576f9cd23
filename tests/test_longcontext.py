"""Long-context checks: the chunked oracle equals the materialized oracle,
and FA2 runs a long sequence (the TPU extension beyond the reference's
S=4096 ceiling, SURVEY.md §5 long-context note)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.kernels.attention import flash_attention
from cuda_flash_attention_tpu.ops.metrics import compute_metrics

cpu_count = len(jax.devices("cpu"))
needs8 = pytest.mark.skipif(cpu_count < 8, reason="needs 8 virtual CPU devices")

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


@pytest.mark.slow
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


@needs8
def test_quantized_ring_matches_fp32_ring():
    """int8-KV ring attention (serving path) tracks the full-precision ring
    within the int8 quantization budget."""
    from cuda_flash_attention_tpu.parallel import ring_attention_quantized
    from cuda_flash_attention_tpu.parallel.mesh import cpu_test_mesh

    mesh = cpu_test_mesh({"ctx": 4})
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q, k, v = (jax.random.normal(kk, (1, 2, 512, 64), jnp.float32) for kk in ks)
    ref = vanilla_attention(q, k, v, causal=True)
    o = ring_attention_quantized(mesh, q, k, v, causal=True)
    m = compute_metrics(o, ref)
    assert m.passes(5e-2), m


@needs8
def test_quantized_ring_gqa():
    """GQA flows through the quantized ring: only Hkv quantized heads rotate
    (4x less ICI traffic again on top of the int8 ratio for 4:1 groups) —
    enabled by the quant kernel's kernel-native kv_groups routing."""
    from cuda_flash_attention_tpu.parallel import ring_attention_quantized
    from cuda_flash_attention_tpu.parallel.mesh import cpu_test_mesh

    mesh = cpu_test_mesh({"ctx": 4})
    ks = jax.random.split(jax.random.PRNGKey(13), 3)
    q = jax.random.normal(ks[0], (1, 8, 512, 64), jnp.float32)
    k = jax.random.normal(ks[1], (1, 2, 512, 64), jnp.float32)
    v = jax.random.normal(ks[2], (1, 2, 512, 64), jnp.float32)
    ref = vanilla_attention(
        q, jnp.repeat(k, 4, axis=1), jnp.repeat(v, 4, axis=1), causal=True
    )
    o = ring_attention_quantized(mesh, q, k, v, causal=True)
    m = compute_metrics(o, ref)
    assert m.passes(5e-2), m


@needs8
def test_quantized_ring_int4():
    """INT4-KV ring: packed split-half blocks rotate (8x less ICI than
    fp32); accuracy within the 4-bit budget."""
    from cuda_flash_attention_tpu.parallel import ring_attention_quantized
    from cuda_flash_attention_tpu.parallel.mesh import cpu_test_mesh

    from cuda_flash_attention_tpu.kernels.fa2_forward_quant import (
        flash_attention_quantized_kv,
    )
    from cuda_flash_attention_tpu.quant.qtensor import quantize_kv

    mesh = cpu_test_mesh({"ctx": 4})
    ks = jax.random.split(jax.random.PRNGKey(14), 3)
    q, k, v = (jax.random.normal(kk, (1, 2, 512, 64), jnp.float32) for kk in ks)
    o = ring_attention_quantized(mesh, q, k, v, causal=True, kv_dtype="int4")
    # Tight: per-token scales are shard-independent, so the ring must match
    # the single-device int4 kernel (same quantization, different schedule).
    k_q, v_q = quantize_kv(k, v, "int4")
    o_single = flash_attention_quantized_kv(q, k_q, v_q, causal=True)
    m = compute_metrics(o, o_single)
    assert m.max_abs_error < 2e-2, m
    # Loose sanity vs fp32: the 4-bit budget itself.
    m_fp = compute_metrics(o, vanilla_attention(q, k, v, causal=True))
    assert m_fp.mean_abs_error < 5e-2 and not m_fp.has_nan, m_fp


def test_int4_quant_kernel_matches_dequant_oracle():
    """The fused-dequant prefill kernel over packed int4 KV is EXACT
    against attention over the dequantized tensors (quant error lives only
    in the storage round trip)."""
    from cuda_flash_attention_tpu.kernels.fa2_forward_quant import (
        flash_attention_quantized_kv,
    )
    from cuda_flash_attention_tpu.quant.qtensor import quantize_kv

    ks = jax.random.split(jax.random.PRNGKey(15), 3)
    q, k, v = (jax.random.normal(kk, (1, 2, 256, 64), jnp.float32) for kk in ks)
    k_q, v_q = quantize_kv(k, v, "int4")
    assert k_q.values.shape[-1] == 32 and k_q.bits == 4
    o = flash_attention_quantized_kv(q, k_q, v_q, causal=True)
    ref = vanilla_attention(
        q, k_q.dequantize(jnp.float32), v_q.dequantize(jnp.float32),
        causal=True,
    )
    m = compute_metrics(o, ref)
    assert m.max_abs_error < 2e-2, m  # bf16 compute budget, exact dequant


@needs8
def test_quantized_ring_fp8():
    from cuda_flash_attention_tpu.parallel import ring_attention_quantized
    from cuda_flash_attention_tpu.parallel.mesh import cpu_test_mesh

    mesh = cpu_test_mesh({"ctx": 4})
    ks = jax.random.split(jax.random.PRNGKey(12), 3)
    q, k, v = (jax.random.normal(kk, (1, 2, 512, 64), jnp.float32) for kk in ks)
    ref = vanilla_attention(q, k, v)
    o = ring_attention_quantized(
        mesh, q, k, v, kv_dtype=jnp.float8_e4m3fn
    )
    m = compute_metrics(o, ref)
    assert m.passes(8e-2), m
