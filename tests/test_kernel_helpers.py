"""Unit tests for the round-2 kernel-layer helpers: lane-packed fp32 MXU
emulation, fp8 storage casts, padding quanta, and the roofline/MFU model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.kernels.common import (
    MIN_BLOCK,
    fit_block,
    mxu_dot_out,
    mxu_dot_ta_out,
    mxu_dot_tb,
    seq_pad_quantum,
    storage_cast,
)
from cuda_flash_attention_tpu.utils.profiling import (
    chip_peaks,
    mfu,
    mxu_derate,
    roofline_time,
)


# -- lane-packed fp32 emulation ---------------------------------------------


def _rand(shape, seed, scale=1.0):
    return scale * jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


@pytest.mark.quick
def test_mxu_dot_tb_full_f32_quality():
    a, b = _rand((512, 64), 0), _rand((512, 64), 1)
    got = mxu_dot_tb(a, b)
    ref = jnp.einsum("md,nd->mn", a, b, precision=jax.lax.Precision.HIGHEST)
    rel = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
    assert rel < 1e-6, rel


def test_mxu_dot_out_exact_quality():
    a = jnp.abs(_rand((512, 512), 2))  # p-like: nonnegative
    b = _rand((512, 64), 3)
    got = mxu_dot_out(a, b, exact=True)
    ref = jnp.einsum("mk,kd->md", a, b, precision=jax.lax.Precision.HIGHEST)
    rel = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
    # 2e-6: the fused-fp32 reference rounds differently per backend (CPU
    # XLA reassociates; measured 1.15e-6 there, <1e-6 on the chip) — the
    # budget is "f32 quality" for a 512-length contraction, not bitwise.
    assert rel < 2e-6, rel


def test_mxu_dot_ta_out_cheap_quality():
    a, b = _rand((512, 512), 4), _rand((512, 64), 5)
    got = mxu_dot_ta_out(a, b)  # 2-chunk, ~1e-5 relative budget
    ref = jnp.einsum("km,kd->md", a, b, precision=jax.lax.Precision.HIGHEST)
    rel = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
    assert rel < 1e-4, rel


def test_small_rows_fall_back_to_native():
    # Below _EMULATE_MIN_ROWS the helper must return the native result path
    # (same math either way — just assert correctness at a tiny shape).
    a, b = _rand((32, 64), 6), _rand((32, 64), 7)
    ref = jnp.einsum("md,nd->mn", a, b, precision=jax.lax.Precision.HIGHEST)
    assert float(jnp.abs(mxu_dot_tb(a, b) - ref).max()) < 1e-5


# -- fp8 storage cast --------------------------------------------------------


@pytest.mark.parametrize("dt", [jnp.float8_e4m3fn, jnp.float8_e5m2])
@pytest.mark.quick
def test_storage_cast_matches_astype(dt):
    rng = np.random.default_rng(0)
    # Mix normal-range and tiny (subnormal-exercising) values.
    vals = np.concatenate([
        rng.standard_normal(2048).astype(np.float32) * 10,
        rng.standard_normal(2048).astype(np.float32) * 1e-3,
        np.zeros(64, np.float32),
    ])
    x = jnp.asarray(vals).astype(dt)
    ref = np.asarray(x.astype(jnp.float32))
    got = np.asarray(storage_cast(x, jnp.float32))
    finite = np.isfinite(ref)
    np.testing.assert_array_equal(got[finite], ref[finite])


@pytest.mark.parametrize("dt", [jnp.float8_e4m3fn, jnp.float8_e5m2])
@pytest.mark.quick
def test_storage_cast_ftz_matches_on_flushed_data(dt):
    """The ftz fast path (paged decode kernels) is exact on data produced
    under the KV quantizer's subnormal-flush contract, including zeros."""
    from cuda_flash_attention_tpu.decode.kv_cache import _quantize_rows

    rng = np.random.default_rng(1)
    x = jnp.asarray(
        np.concatenate([
            rng.standard_normal((64, 64)).astype(np.float32),
            rng.standard_normal((64, 64)).astype(np.float32) * 1e-6,
            np.zeros((4, 64), np.float32),
        ])
    )
    values, scales = _quantize_rows(x, dt)
    ref = np.asarray(values.astype(jnp.float32))
    got = np.asarray(storage_cast(values, jnp.float32, ftz=True))
    np.testing.assert_array_equal(got, ref)
    # ... and the producer really flushed: no subnormal codes in storage.
    bits = np.asarray(values).view(np.uint8)
    mant_bits = 3 if dt == jnp.float8_e4m3fn else 2
    em = bits & 0x7F
    assert not ((em > 0) & (em < (1 << mant_bits))).any()


def test_storage_cast_int8_passthrough():
    x = jnp.arange(-128, 128, dtype=jnp.int8)
    np.testing.assert_array_equal(
        np.asarray(storage_cast(x, jnp.float32)),
        np.asarray(x.astype(jnp.float32)),
    )


# -- padding quanta ----------------------------------------------------------


def test_seq_pad_quantum():
    assert seq_pad_quantum(2048, jnp.float32) == MIN_BLOCK
    assert seq_pad_quantum(128, jnp.float32) == MIN_BLOCK
    assert seq_pad_quantum(100, jnp.float32) == 8
    assert seq_pad_quantum(100, jnp.bfloat16) == 16
    assert seq_pad_quantum(32, jnp.int8) == 32


def test_fit_block_sub128():
    assert fit_block(1024, 32) == 32
    assert fit_block(1024, 104) == 104
    assert fit_block(1024, 256) == 256
    assert fit_block(512, 2048) == 512


# -- roofline / MFU model ----------------------------------------------------


def test_mxu_derate():
    assert mxu_derate(64) == 0.5
    assert mxu_derate(128) == 1.0
    assert mxu_derate(256) == 1.0
    assert mxu_derate(128, out_lanes=64) == 0.5


def test_roofline_bounds():
    p = chip_peaks()
    r = roofline_time(1e12, 1e9, derate=0.5, peaks=p)
    assert r["t_mxu_s"] == pytest.approx(1e12 / (p.bf16_tflops * 1e12 * 0.5))
    assert r["t_hbm_s"] == pytest.approx(1e9 / (p.hbm_gbps * 1e9))
    assert r["t_ideal_s"] == max(r["t_mxu_s"], r["t_hbm_s"], r["t_vpu_s"])
    assert r["bound"] in ("mxu", "hbm", "vpu")


def test_mfu_accounting():
    p = chip_peaks()
    out = mfu(p.bf16_tflops * 1e12, 1.0, derate=0.5, peaks=p)
    assert out["mfu"] == pytest.approx(1.0)
    assert out["mfu_derated"] == pytest.approx(2.0)
