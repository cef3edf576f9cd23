"""Quantization layer tests: round-trip error, fused-dequant attention
kernel exactness, weight-only dense quant, and quantized end-to-end model.

Accuracy gating follows the reference harness pattern (max-abs tolerance +
NaN/Inf gate, /root/reference/test_flash_attention2.py:1018-1020) with
budgets scaled to each bit-width (SURVEY.md §7.8: "accuracy gated at the
same max-abs/MSE budget per bit-width").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.kernels.fa2_forward_quant import (
    flash_attention_int8_kv,
    flash_attention_quantized_kv,
)
from cuda_flash_attention_tpu.ops.reference import vanilla_attention
from cuda_flash_attention_tpu.quant import (
    QuantizedTensor,
    dequantize,
    quantize,
    quantize_kv,
    quantize_transformer_params,
    quantize_weight,
    quantized_matmul,
)


def _qkv(b=2, h=2, s=256, d=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    return q, k, v


# ---------------------------------------------------------------------------
# QuantizedTensor round trip
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn])
@pytest.mark.quick
def test_quantize_roundtrip(dtype):
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 128), jnp.float32)
    qt = quantize(x, dtype, axis=-1)
    assert qt.values.dtype == jnp.dtype(dtype)
    assert qt.scales.shape == (64, 1)
    x_hat = dequantize(qt)
    # Error bound per format: int8 step is amax/127 (absolute); e4m3 has a
    # 3-bit mantissa -> worst-case relative step 2^-3, half-step 6.25%.
    err = jnp.max(jnp.abs(x - x_hat))
    amax = jnp.max(jnp.abs(x))
    bound = amax / 100 if jnp.dtype(dtype) == jnp.dtype(jnp.int8) else amax * 0.0725
    assert err < bound
    assert not jnp.any(jnp.isnan(x_hat))


def test_quantized_tensor_is_pytree():
    x = jnp.ones((8, 128))
    qt = quantize(x, jnp.int8, axis=-1)
    leaves = jax.tree.leaves(qt)
    assert len(leaves) == 2
    qt2 = jax.jit(lambda t: t)(qt)
    assert isinstance(qt2, QuantizedTensor)
    np.testing.assert_array_equal(qt.values, qt2.values)


# ---------------------------------------------------------------------------
# Fused-dequant attention kernel
# ---------------------------------------------------------------------------


def test_quant_kernel_matches_dequantized_oracle_exactly():
    """With fp32 in-kernel compute, the fused-scale algebra must match
    attention over the explicitly dequantized K/V to fp32 accumulation
    accuracy — this isolates the fusion from the quantization error."""
    q, k, v = _qkv(s=320)  # non-multiple of 128 exercises tail masking
    k_q, v_q = quantize_kv(k, v, jnp.int8)
    o_kernel = flash_attention_quantized_kv(
        q, k_q, v_q, compute_dtype=jnp.float32
    )
    o_ref = vanilla_attention(q, dequantize(k_q), dequantize(v_q))
    np.testing.assert_allclose(np.asarray(o_kernel), np.asarray(o_ref), atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_int8_kv_attention_accuracy(causal):
    """End-to-end int8 KV error vs the fp32 oracle stays within the int8
    budget on gaussian data."""
    q, k, v = _qkv(s=256)
    o_q = flash_attention_int8_kv(q, k, v, causal=causal,
                                  compute_dtype=jnp.float32)
    o_ref = vanilla_attention(q, k, v, causal=causal)
    err = jnp.max(jnp.abs(o_q - o_ref))
    assert err < 0.05, f"int8 KV max abs err {err}"
    assert not jnp.any(jnp.isnan(o_q))


def test_fp8_kv_attention_accuracy():
    q, k, v = _qkv(s=256)
    k_q, v_q = quantize_kv(k, v, jnp.float8_e4m3fn)
    o_q = flash_attention_quantized_kv(q, k_q, v_q, compute_dtype=jnp.float32)
    o_ref = vanilla_attention(q, k, v)
    err = jnp.max(jnp.abs(o_q - o_ref))
    assert err < 0.08, f"fp8 KV max abs err {err}"


def test_quant_kernel_ragged_and_causal():
    q, k, v = _qkv(s=100)  # Edge-NonPowerOf2 parity (S=100)
    o_q = flash_attention_int8_kv(q, k, v, causal=True,
                                  compute_dtype=jnp.float32)
    o_ref = vanilla_attention(q, k, v, causal=True)
    assert o_q.shape == o_ref.shape
    assert jnp.max(jnp.abs(o_q - o_ref)) < 0.05
    assert not jnp.any(jnp.isnan(o_q))


@pytest.mark.parametrize("causal", [False, True])
def test_quant_kernel_gqa(causal):
    """Kernel-native GQA on the quantized path: Hq = 4 * Hkv vs the
    dequantized oracle with explicitly repeated KV heads (the serving
    flagship config is GQA — round-2 verdict gap #5)."""
    b, hq, hkv, s, d = 2, 8, 2, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, hq, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.float32)
    k_q, v_q = quantize_kv(k, v, jnp.int8)
    o_kernel = flash_attention_quantized_kv(
        q, k_q, v_q, causal=causal, compute_dtype=jnp.float32
    )
    rep = lambda x: jnp.repeat(x, hq // hkv, axis=1)  # noqa: E731
    o_ref = vanilla_attention(
        q, rep(dequantize(k_q)), rep(dequantize(v_q)), causal=causal
    )
    np.testing.assert_allclose(
        np.asarray(o_kernel), np.asarray(o_ref), atol=2e-5
    )


def test_quant_kernel_segments():
    """Sequence-packing segment ids on the quantized path match the
    dequantized oracle's segment masking."""
    from cuda_flash_attention_tpu.ops.reference import (
        vanilla_attention as vref,
    )

    q, k, v = _qkv(s=256)
    seg = jnp.concatenate(
        [jnp.zeros((2, 128), jnp.int32), jnp.ones((2, 128), jnp.int32)],
        axis=1,
    )
    k_q, v_q = quantize_kv(k, v, jnp.int8)
    o_kernel = flash_attention_quantized_kv(
        q, k_q, v_q, compute_dtype=jnp.float32,
        q_segment_ids=seg, kv_segment_ids=seg,
    )
    o_ref = vref(
        q, dequantize(k_q), dequantize(v_q),
        q_segment_ids=seg, kv_segment_ids=seg,
    )
    np.testing.assert_allclose(
        np.asarray(o_kernel), np.asarray(o_ref), atol=2e-5
    )


def test_quant_kernel_validation_errors():
    q, k, v = _qkv(s=256)
    k_q, v_q = quantize_kv(k, v, jnp.int8)
    with pytest.raises(ValueError, match="GQA requires"):
        flash_attention_quantized_kv(q[:, :1], k_q, v_q)  # 1 q head, 2 kv
    bad_scales = QuantizedTensor(
        values=k_q.values, scales=k_q.scales[..., 0]  # wrong rank
    )
    with pytest.raises(ValueError, match="scales"):
        flash_attention_quantized_kv(q, bad_scales, v_q)


# ---------------------------------------------------------------------------
# Weight-only quantization
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_quantized_matmul_matches_dequantized():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (16, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (256, 512), jnp.float32) * 0.05
    w_q = quantize_weight(w, jnp.int8)
    # At HIGHEST precision the fused scale-after-contraction form is exactly
    # the dequantized matmul (pure algebra, no precision asymmetry).
    y_fused = quantized_matmul(x, w_q, precision=jax.lax.Precision.HIGHEST)
    y_explicit = jnp.dot(x, dequantize(w_q), precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_explicit), rtol=1e-5, atol=1e-5
    )
    # The default (reduced-pass) fused path still tracks the fp32 matmul
    # within the int8 budget.
    assert jnp.max(jnp.abs(quantized_matmul(x, w_q) - x @ w)) < 0.05


@pytest.mark.slow
def test_quantized_transformer_forward():
    from cuda_flash_attention_tpu.models import (
        TransformerConfig, forward, init_params,
    )

    cfg = TransformerConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0, cfg.vocab_size)

    logits_fp = forward(params, tokens, cfg)
    q_params = quantize_transformer_params(params, jnp.int8)
    n_quant = sum(
        isinstance(leaf, QuantizedTensor)
        for leaf in jax.tree.leaves(
            q_params, is_leaf=lambda x: isinstance(x, QuantizedTensor)
        )
    )
    assert n_quant == 7 * cfg.n_layers + 1  # 7 projections/layer + lm_head
    logits_q = jax.jit(lambda p, t: forward(p, t, cfg))(q_params, tokens)
    assert logits_q.shape == logits_fp.shape
    assert not jnp.any(jnp.isnan(logits_q))
    # int8 weight-only should track fp32 logits closely on a tiny model.
    rel = jnp.max(jnp.abs(logits_q - logits_fp)) / (
        jnp.max(jnp.abs(logits_fp)) + 1e-9
    )
    assert rel < 0.15, f"quantized logits diverged: rel={rel}"


def test_int4_pack_roundtrip_exact():
    """pack/unpack of 4-bit values is lossless over the full [-8, 7]
    range."""
    from cuda_flash_attention_tpu.quant import pack_int4, unpack_int4

    q = jnp.asarray(
        np.random.default_rng(0).integers(-8, 8, size=(256, 64)), jnp.int8
    )
    rt = unpack_int4(pack_int4(q))
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(q))


def test_int4_groupwise_quality_and_pytree():
    """Group-wise int4 weight round trip stays within the 4-bit budget
    (<= scale/2 per element = amax/14 per group) and survives pytree
    flatten/unflatten with its packed metadata."""
    from cuda_flash_attention_tpu.quant import quantize_int4

    w = jax.random.normal(jax.random.PRNGKey(5), (512, 384), jnp.float32)
    qt = quantize_int4(w, group_size=128)
    assert qt.bits == 4 and qt.values.shape == (256, 384)
    assert qt.shape == (512, 384)
    err = jnp.abs(qt.dequantize() - w)
    bound = jnp.repeat(qt.scales[:, 0, :], 128, axis=0) * 0.5 + 1e-6
    assert bool(jnp.all(err <= bound))
    leaves, treedef = jax.tree.flatten(qt)
    rt = jax.tree.unflatten(treedef, leaves)
    assert rt.bits == 4 and rt.group_size == 128
    np.testing.assert_array_equal(
        np.asarray(rt.dequantize()), np.asarray(qt.dequantize())
    )


@pytest.mark.slow
def test_int4_transformer_forward_and_decode():
    """int4 weight-only model: forward tracks fp32 within the 4-bit budget
    and the decode engine generates end to end."""
    import dataclasses

    from cuda_flash_attention_tpu.decode import DecodeEngine
    from cuda_flash_attention_tpu.models import (
        TransformerConfig, forward, init_params,
    )

    cfg = TransformerConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (2, 128), 0, cfg.vocab_size
    )
    logits_fp = forward(params, tokens, cfg)
    q_params = quantize_transformer_params(params, "int4")
    logits_q = jax.jit(lambda p, t: forward(p, t, cfg))(q_params, tokens)
    assert not jnp.any(jnp.isnan(logits_q))
    rel = jnp.max(jnp.abs(logits_q - logits_fp)) / (
        jnp.max(jnp.abs(logits_fp)) + 1e-9
    )
    assert rel < 0.35, f"int4 logits diverged: rel={rel}"

    eng = DecodeEngine(q_params, cfg, max_seqs=2, max_seq_len=256)
    reqs = eng.run([[1, 2, 3], [4, 5]], max_new_tokens=4)
    assert all(r.done and len(r.generated) == 4 for r in reqs)


def test_qlora_int4_base():
    """4-bit QLoRA: adapters train against a packed int4 base; merge
    requantizes group-wise at 4 bits."""
    from cuda_flash_attention_tpu.models import (
        TransformerConfig, forward, init_params,
    )
    from cuda_flash_attention_tpu.models.lora import apply_lora, merge_lora

    cfg = TransformerConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_transformer_params(params, "int4")
    lp = apply_lora(qp, jax.random.PRNGKey(3), rank=4)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 33), 0,
                              cfg.vocab_size)
    out = forward(lp, toks, cfg)
    assert bool(jnp.isfinite(out).all())
    merged = merge_lora(lp)
    wq = merged["layers"][0]["wq"]
    assert isinstance(wq, QuantizedTensor) and wq.bits == 4
    out_m = forward(merged, toks, cfg)
    assert float(jnp.max(jnp.abs(out - out_m))) < 0.6  # 4-bit requant noise


def test_w8a8_matmul_accuracy():
    """W8A8 (int8 activations x int8 weights on the native MXU) stays within
    the ~1% dynamic-quant budget of the bf16 reference matmul."""
    import jax

    from cuda_flash_attention_tpu.quant.linear import (
        quantize_weight,
        w8a8_matmul,
    )

    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (16, 256), jnp.bfloat16)
    w = jax.random.normal(kw, (256, 512), jnp.float32)
    w_q = quantize_weight(w, jnp.int8)
    got = w8a8_matmul(x, w_q).astype(jnp.float32)
    ref = (x.astype(jnp.float32) @ w)
    rel = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
    assert rel < 0.03, rel


def test_act_quant_flag_routes_dense():
    from cuda_flash_attention_tpu.quant.linear import dense, quantize_weight
    from cuda_flash_attention_tpu.quant.qtensor import QuantizedTensor
    import jax

    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (8, 128), jnp.bfloat16)
    w = jax.random.normal(kw, (128, 128), jnp.float32)
    q = quantize_weight(w, jnp.int8)
    q8 = QuantizedTensor(q.values, q.scales, act_quant=True)
    # Both paths approximate the same product; W8A8 quantizes activations too.
    a = dense(x, q).astype(jnp.float32)
    b = dense(x, q8).astype(jnp.float32)
    assert float(jnp.abs(a - b).max() / jnp.abs(a).max()) < 0.03
