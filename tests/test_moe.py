"""MoE / expert-parallelism tests (models/moe.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.models import (
    TransformerConfig,
    forward,
    init_opt_state,
    init_params,
    loss_fn,
    make_train_step,
    param_shardings,
)
from cuda_flash_attention_tpu.models.moe import (
    expert_capacity,
    init_moe_layer,
    moe_ffn,
)

needs8 = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs 8 virtual CPU devices"
)


def _fp32_cfg(**kw):
    return TransformerConfig(
        vocab_size=64, d_model=32, n_layers=2, n_heads=2, n_kv_heads=2,
        head_dim=16, d_ff=64, n_experts=4, dtype=jnp.float32,
        attn_tile_dtype=None, **kw,
    )


def _reference_moe(x, layer, cfg):
    """Per-token numpy reference: renormalized top-k gates, full SwiGLU per
    selected expert, NO capacity limit."""
    xf = np.asarray(x, np.float32).reshape(-1, x.shape[-1])
    router = np.asarray(layer["router"], np.float32)
    logits = xf @ router
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    out = np.zeros_like(xf)
    for n in range(xf.shape[0]):
        idx = np.argsort(-probs[n])[: cfg.expert_top_k]
        gates = probs[n, idx] / probs[n, idx].sum()
        for g, e in zip(gates, idx):
            wg = np.asarray(layer["moe_gate"][e], np.float32)
            wu = np.asarray(layer["moe_up"][e], np.float32)
            wd = np.asarray(layer["moe_down"][e], np.float32)
            a = xf[n] @ wg
            silu = a / (1.0 + np.exp(-a))
            out[n] += g * ((silu * (xf[n] @ wu)) @ wd)
    return out.reshape(x.shape)


def test_moe_ffn_matches_per_token_reference():
    cfg = _fp32_cfg(capacity_factor=8.0)  # capacity ample: nothing drops
    layer = init_moe_layer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.d_model),
                          jnp.float32)
    y, aux = moe_ffn(x, layer, cfg)
    ref = _reference_moe(x, layer, cfg)
    err = float(jnp.abs(y - ref).max())
    assert err < 1e-4, err
    assert float(aux) >= 1.0 - 1e-6  # Switch loss lower bound at top-1


def test_moe_capacity_drops_overflow_tokens():
    cfg = _fp32_cfg(capacity_factor=0.01)  # capacity floor: 8 slots/expert
    layer = init_moe_layer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, cfg.d_model),
                          jnp.float32)
    y, _ = moe_ffn(x, layer, cfg)
    assert bool(jnp.isfinite(y).all())
    # With 256 tokens * k=2 routes and only 8 slots/expert, most tokens must
    # have been dropped -> output much smaller than the undropped reference.
    ref = _reference_moe(x, layer, cfg)
    assert float(jnp.abs(y).sum()) < 0.5 * float(jnp.abs(ref).sum())


def test_expert_capacity_static():
    assert expert_capacity(256, 4, 2, 1.25) == 168  # 256*2*1.25/4+1 -> 161->168
    assert expert_capacity(8, 8, 1, 1.0) % 8 == 0


def test_moe_model_trains():
    cfg = TransformerConfig.tiny_moe()
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "router" in params["layers"][1] and "router" not in params["layers"][0]
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 33), 0,
                                cfg.vocab_size)
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, cfg)
    assert bool(jnp.isfinite(loss))
    g_router = grads["layers"][1]["router"]
    assert float(jnp.abs(g_router).max()) > 0.0  # router learns


@needs8
@pytest.mark.slow
def test_moe_ep_mesh_train_step():
    """EP: experts sharded over the 'expert' axis; the dispatch/combine
    einsums partition into the all-to-all under pjit."""
    from cuda_flash_attention_tpu.parallel.mesh import cpu_test_mesh

    mesh = cpu_test_mesh({"data": 2, "expert": 4})
    cfg = TransformerConfig.tiny_moe(n_experts=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    shardings = param_shardings(mesh, cfg)
    params = jax.tree.map(jax.device_put, params, shardings)
    opt = jax.tree.map(jax.device_put, init_opt_state(params), shardings)
    from jax.sharding import NamedSharding, PartitionSpec as P

    tokens = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(1), (4, 65), 0, cfg.vocab_size),
        NamedSharding(mesh, P("data", None)),
    )
    step = jax.jit(make_train_step(cfg, mesh=mesh))
    params, opt, loss = step(params, opt, tokens)
    jax.block_until_ready(loss)
    assert bool(jnp.isfinite(loss)), float(loss)
    # Expert weights actually sharded over the expert axis.
    sh = params["layers"][1]["moe_gate"].sharding
    assert "expert" in str(sh.spec)


@needs8
@pytest.mark.slow
def test_moe_ep_tp_mesh_parity():
    """EP x TP: expert FFNs Megatron-split over 'model' ON TOP OF the
    expert axis — the sharded layer must reproduce the single-device
    output (one psum over 'model' at the down-projection)."""
    from cuda_flash_attention_tpu.models.moe import moe_layer_shardings
    from cuda_flash_attention_tpu.parallel.mesh import cpu_test_mesh

    cfg = _fp32_cfg(capacity_factor=8.0)
    layer = init_moe_layer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.d_model),
                          jnp.float32)
    y_ref, aux_ref = moe_ffn(x, layer, cfg)

    mesh = cpu_test_mesh({"data": 2, "expert": 2, "model": 2})
    sh = moe_layer_shardings(mesh, cfg)
    assert "model" in str(sh["moe_gate"].spec)  # TP really applied
    layer_s = jax.tree.map(jax.device_put, layer, sh)
    y, aux = jax.jit(lambda xx, ll: moe_ffn(xx, ll, cfg, mesh=mesh))(
        x, layer_s
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)
    assert abs(float(aux) - float(aux_ref)) < 1e-6


def test_moe_decode_engine_generates():
    """MoE serving path: the decode engine runs an MoE model end to end."""
    from cuda_flash_attention_tpu.decode.engine import DecodeEngine

    cfg = TransformerConfig.tiny_moe()
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = DecodeEngine(params, cfg, max_seqs=2, max_seq_len=256)
    reqs = eng.run([[1, 2, 3], [4, 5]], max_new_tokens=4)
    assert all(r.done and len(r.generated) == 4 for r in reqs)


def test_scatter_dispatch_matches_onehot_oracle():
    """The production scatter/gather MoE dispatch (round-2 verdict #10) must
    reproduce the GShard one-hot einsum form bit-for-bit in routing and to
    fp32 matmul accuracy in values — including overflow-token drops."""
    import dataclasses

    from cuda_flash_attention_tpu.models.moe import moe_ffn_onehot

    cfg = dataclasses.replace(
        TransformerConfig.tiny_moe(n_experts=4),
        dtype=jnp.float32, attn_tile_dtype=None,
        capacity_factor=0.6,  # force real overflow so drops are exercised
    )
    layer = init_moe_layer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 96, cfg.d_model),
                          jnp.float32)
    y1, aux1 = moe_ffn(x, layer, cfg)
    y2, aux2 = moe_ffn_onehot(x, layer, cfg)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5)
    assert abs(float(aux1) - float(aux2)) < 1e-6
