"""Pipeline-parallel (PP) tests on the virtual CPU fabric."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.models import (
    TransformerConfig,
    init_params,
    loss_fn,
)
from cuda_flash_attention_tpu.models.pipeline import (
    make_pp_loss_fn,
    make_pp_train_step,
    pipeline_param_shardings,
    stack_pipeline_params,
)
from cuda_flash_attention_tpu.parallel.mesh import cpu_test_mesh

needs8 = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs 8 virtual CPU devices"
)


def _cfg():
    # fp32 end to end so the PP-vs-single-device comparison is tight.
    return TransformerConfig(
        vocab_size=64, d_model=64, n_layers=4, n_heads=2, n_kv_heads=2,
        head_dim=32, d_ff=128, dtype=jnp.float32, attn_tile_dtype=None,
    )


def test_stack_pipeline_params_shapes():
    cfg = _cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    pp = stack_pipeline_params(params, 2)
    assert pp["stages"]["wq"].shape == (2, 2, cfg.d_model, cfg.q_dim)
    with pytest.raises(ValueError, match="split"):
        stack_pipeline_params(params, 3)


def test_stack_rejects_heterogeneous_layers():
    cfg = TransformerConfig.tiny_moe()  # layer 1 MoE, layer 0 dense
    params = init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="homogeneous"):
        stack_pipeline_params(params, 2)


@needs8
def test_pp_loss_matches_single_device():
    cfg = _cfg()
    mesh = cpu_test_mesh({"pipe": 2})
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 33), 0,
                                cfg.vocab_size)
    ref = float(loss_fn(params, tokens, cfg))

    pp = stack_pipeline_params(params, 2)
    pp = jax.tree.map(jax.device_put, pp, pipeline_param_shardings(mesh, pp))
    pp_loss = make_pp_loss_fn(cfg, mesh, n_stages=2, n_micro=2)
    got = float(jax.jit(pp_loss)(pp, tokens))
    # PP forwards all 33 tokens (the reference forwards 32) — causal math is
    # identical but the padded kernel shapes differ, so fp32 rounding drifts
    # a few 1e-4.
    assert abs(got - ref) < 5e-4, (got, ref)


@needs8
@pytest.mark.slow
def test_pp_train_step_runs_and_learns():
    cfg = _cfg()
    mesh = cpu_test_mesh({"pipe": 4})
    params = init_params(jax.random.PRNGKey(0), cfg)
    pp = stack_pipeline_params(params, 4)
    shardings = pipeline_param_shardings(mesh, pp)
    pp = jax.tree.map(jax.device_put, pp, shardings)
    opt = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), pp)
    opt = jax.tree.map(jax.device_put, opt, shardings)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 33), 0,
                                cfg.vocab_size)
    step = jax.jit(make_pp_train_step(cfg, mesh, n_stages=4, n_micro=4))
    pp1, opt1, loss1 = step(pp, opt, tokens)
    pp2, opt2, loss2 = step(pp1, opt1, tokens)
    assert bool(jnp.isfinite(loss1)) and bool(jnp.isfinite(loss2))
    assert float(loss2) < float(loss1)  # same batch twice -> must improve
    # Both stages' weights moved (the backward pipeline reached stage 0).
    dw = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                      pp["stages"]["wq"], pp2["stages"]["wq"])
    assert np.asarray(dw).min() >= 0  # structure intact
    assert float(jnp.abs(pp["stages"]["wq"][0] - pp2["stages"]["wq"][0]).max()) > 0
    assert float(jnp.abs(pp["stages"]["wq"][-1] - pp2["stages"]["wq"][-1]).max()) > 0


@needs8
def test_pp_tp_loss_matches_single_device():
    """PP x TP composition (round-2 verdict #9): stage weights sharded over
    'model' inside the pipe shard_map, psum after wo/w_down — the loss must
    still match the single-device value."""
    cfg = _cfg()
    mesh = cpu_test_mesh({"pipe": 2, "model": 2})
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 33), 0,
                                cfg.vocab_size)
    ref = float(loss_fn(params, tokens, cfg))

    pp = stack_pipeline_params(params, 2)
    pp = jax.tree.map(jax.device_put, pp, pipeline_param_shardings(mesh, pp))
    pp_loss = make_pp_loss_fn(cfg, mesh, n_stages=2, n_micro=2)
    got = float(jax.jit(pp_loss)(pp, tokens))
    assert abs(got - ref) < 5e-4, (got, ref)


@needs8
def test_pp_moe_aux_loss_included():
    """A homogeneous-MoE model (moe_every=1) trained under PP must carry the
    router aux loss (round-2 advisor finding): PP loss == loss_fn."""
    cfg = TransformerConfig(
        vocab_size=64, d_model=64, n_layers=2, n_heads=2, n_kv_heads=2,
        head_dim=32, d_ff=128, dtype=jnp.float32, attn_tile_dtype=None,
        n_experts=4, moe_every=1, expert_top_k=2,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 33), 0,
                                cfg.vocab_size)
    ref = float(loss_fn(params, tokens, cfg))
    mesh = cpu_test_mesh({"pipe": 2})
    pp = stack_pipeline_params(params, 2)
    pp = jax.tree.map(jax.device_put, pp, pipeline_param_shardings(mesh, pp))
    pp_loss = make_pp_loss_fn(cfg, mesh, n_stages=2, n_micro=2)
    got = float(jax.jit(pp_loss)(pp, tokens))
    # The aux term is batch-dependent; microbatched routing sees halves of
    # the batch, so aux (coef 0.01) differs slightly from the full-batch
    # value — but a DROPPED aux would differ by the whole aux magnitude.
    aux_scale = cfg.router_aux_coef * cfg.n_layers
    assert abs(got - ref) < 0.5 * aux_scale + 5e-4, (got, ref)
    # And the aux really is nonzero (dropping it would pass a loose bound).
    nll_only = make_pp_loss_fn(
        dataclasses_replace_aux0(cfg), mesh, n_stages=2, n_micro=2
    )(pp, tokens)
    assert abs(float(nll_only) - got) > 1e-6


def dataclasses_replace_aux0(cfg):
    import dataclasses

    return dataclasses.replace(cfg, router_aux_coef=0.0)
