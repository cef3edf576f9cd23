"""Long-context RoPE scaling: linear position interpolation and NTK-aware
theta inflation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.models import TransformerConfig, forward, init_params
from cuda_flash_attention_tpu.models.transformer import rope


@pytest.mark.quick
def test_rope_args_modes():
    cfg = TransformerConfig.tiny()
    assert cfg.rope_args == (cfg.rope_theta, 1.0)
    lin = dataclasses.replace(cfg, rope_scaling="linear", rope_scale_factor=4.0)
    assert lin.rope_args == (cfg.rope_theta, 4.0)
    ntk = dataclasses.replace(cfg, rope_scaling="ntk", rope_scale_factor=4.0)
    theta, div = ntk.rope_args
    d = cfg.head_dim
    assert div == 1.0
    np.testing.assert_allclose(
        theta, cfg.rope_theta * 4.0 ** (d / (d - 2)), rtol=1e-12
    )
    bad = dataclasses.replace(cfg, rope_scaling="yarn", rope_scale_factor=2.0)
    with pytest.raises(ValueError, match="rope_scaling"):
        _ = bad.rope_args


def test_linear_interpolation_equals_scaled_positions():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 2, 64))
    pos = jnp.arange(8, dtype=jnp.int32)[None] * 4
    np.testing.assert_allclose(
        np.asarray(rope(x, pos, 10000.0, pos_scale=4.0)),
        np.asarray(rope(x, pos // 4, 10000.0)),
        rtol=1e-6, atol=1e-6,
    )


def test_model_forward_under_scaling():
    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 64), 0,
                              cfg.vocab_size)
    base = forward(params, toks, cfg)
    for mode in ("linear", "ntk"):
        scaled_cfg = dataclasses.replace(
            cfg, rope_scaling=mode, rope_scale_factor=8.0
        )
        out = forward(params, toks, scaled_cfg)
        assert bool(jnp.isfinite(out).all())
        # Scaling genuinely changes the positional geometry.
        assert float(jnp.max(jnp.abs(out - base))) > 1e-4, mode
    # Factor 1.0 is a no-op regardless of mode.
    noop = dataclasses.replace(cfg, rope_scaling="ntk", rope_scale_factor=1.0)
    np.testing.assert_array_equal(
        np.asarray(forward(params, toks, noop)), np.asarray(base)
    )
