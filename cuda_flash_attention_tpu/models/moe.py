"""Mixture-of-Experts FFN with expert parallelism (EP).

No reference counterpart (the reference is a kernel library, SURVEY.md §2);
this is the EP member of the framework's parallelism set (DP/TP/SP/EP/PP).
TPU-first design — everything is STATIC-shaped einsum algebra, the
GShard/Switch formulation, so the whole layer jits and shards:

  * router: per-token softmax over E experts, top-k selection.
  * capacity-based dispatch: each expert processes at most C tokens
    (C = ceil(N/E * top_k * capacity_factor) rounded to a sublane multiple);
    a token's slot is its rank among the tokens routed to that expert
    (cumsum — deterministic), overflow tokens fall through with weight 0 on
    that expert (dropless for the others).
  * dispatch/combine are one-hot [N, E, C] tensors; `expert_in =
    einsum('nec,nd->ecd')` IS the all-to-all: under pjit with the expert
    weights sharded over the "expert" mesh axis, XLA partitions the einsum
    into exactly the scatter collective, the expert FFN runs fully local,
    and the combine einsum reduces back — EP without a single hand-written
    collective.
  * auxiliary load-balance loss (Switch eq. 4): E * sum_e f_e * p_e, where
    f_e is the fraction of tokens whose TOP-1 choice is e and p_e the mean
    router probability — pushes the router toward uniform expert load.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cuda_flash_attention_tpu.parallel.mesh import EXPERT_AXIS, MODEL_AXIS


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def expert_capacity(n_tokens: int, n_experts: int, top_k: int,
                    capacity_factor: float) -> int:
    """Static per-expert token capacity (sublane-rounded)."""
    c = int(n_tokens * top_k * capacity_factor / n_experts) + 1
    return max(_round_up(c, 8), 8)


def init_moe_layer(key, cfg) -> dict:
    """Params for one MoE layer (replaces the dense SwiGLU MLP params)."""
    e, d, f = cfg.n_experts, cfg.d_model, cfg.d_ff

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32)
                * fan_in ** -0.5).astype(cfg.param_dtype)

    ks = jax.random.split(key, 4)
    return {
        "mlp_norm": jnp.ones((d,), cfg.param_dtype),
        "router": w(ks[0], (d, e), d),
        "moe_gate": w(ks[1], (e, d, f), d),
        "moe_up": w(ks[2], (e, d, f), d),
        "moe_down": w(ks[3], (e, f, d), f),
    }


def moe_layer_shardings(mesh, cfg) -> dict:
    """Expert weights sharded over the "expert" mesh axis (EP); router and
    norm replicated.  Without an expert axis the experts replicate — the
    layer still runs (pure DP/TP meshes).

    EP x TP: when the mesh ALSO carries a "model" axis, each expert's FFN
    is Megatron-split over it — gate/up shard d_ff column-wise, down shards
    d_ff row-wise, so the only TP collective XLA inserts is one psum over
    "model" at the down-projection contraction (same recipe as the dense
    TP path in parallel/sharded.py)."""
    exp = (
        EXPERT_AXIS
        if mesh is not None
        and EXPERT_AXIS in mesh.axis_names
        and cfg.n_experts % mesh.shape[EXPERT_AXIS] == 0
        else None
    )
    tp = (
        MODEL_AXIS
        if mesh is not None
        and MODEL_AXIS in mesh.axis_names
        and cfg.d_ff % mesh.shape[MODEL_AXIS] == 0
        else None
    )

    def ns(spec):
        return NamedSharding(mesh, spec)

    return {
        "mlp_norm": ns(P(None)),
        "router": ns(P(None, None)),
        "moe_gate": ns(P(exp, None, tp)),
        "moe_up": ns(P(exp, None, tp)),
        "moe_down": ns(P(exp, tp, None)),
    }


def _route(x, layer, cfg):
    """Shared router: returns (probs [N, E], gate_vals [N, k], gate_idx
    [N, k], aux_loss).  Gates renormalized over the top-k; aux is the
    Switch load-balance loss on the top-1 assignment."""
    e, top_k = cfg.n_experts, cfg.expert_top_k
    router_logits = jnp.einsum(
        "nd,de->ne", x.astype(jnp.float32),
        layer["router"].astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    probs = jax.nn.softmax(router_logits, axis=-1)
    gate_vals, gate_idx = jax.lax.top_k(probs, top_k)  # [N, k]
    gate_vals = gate_vals / jnp.sum(gate_vals, axis=-1, keepdims=True)
    top1 = jax.nn.one_hot(gate_idx[:, 0], e, dtype=jnp.float32)
    aux = e * jnp.sum(jnp.mean(top1, axis=0) * jnp.mean(probs, axis=0))
    return probs, gate_vals, gate_idx, aux


def _ranks(gate_idx, e: int):
    """Deterministic capacity ranks WITHOUT [N, E, C] one-hots: a token's
    rank in expert e is its order among tokens routed to e, k-th choices
    after all (k-1)-th choices (GShard's ordering — bit-identical to the
    one-hot formulation).  Only [N, E] cumsums are materialized.
    Returns rank [N, k] int32."""
    n, top_k = gate_idx.shape
    counts = jnp.zeros((e,), jnp.int32)
    ranks = []
    for k in range(top_k):
        mask = jax.nn.one_hot(gate_idx[:, k], e, dtype=jnp.int32)  # [N, E]
        pos = counts[None, :] + jnp.cumsum(mask, axis=0) - mask
        ranks.append(jnp.sum(pos * mask, axis=1))  # this token's rank
        counts = counts + jnp.sum(mask, axis=0)
    return jnp.stack(ranks, axis=1)  # [N, k]


def _expert_ffn(xe, layer, cfg, prec):
    """The per-expert SwiGLU on [E, C, d] — shared by both dispatch forms.
    The expert-dim einsums against expert-sharded weights ARE the EP
    collectives under pjit (see module doc)."""
    gate = jax.nn.silu(
        jnp.einsum("ecd,edf->ecf", xe, layer["moe_gate"].astype(cfg.dtype),
                   precision=prec)
    )
    up = jnp.einsum("ecd,edf->ecf", xe, layer["moe_up"].astype(cfg.dtype),
                    precision=prec)
    return jnp.einsum(
        "ecf,efd->ecd", gate * up, layer["moe_down"].astype(cfg.dtype),
        precision=prec,
    )


def moe_ffn(h, layer, cfg, mesh=None):
    """MoE SwiGLU FFN on pre-normed activations h [..., d_model] —
    scatter/gather dispatch (production path).

    Peak routing memory is O(N*E + E*C*d): tokens scatter directly into the
    [E, C, d] expert buffer and gather back, never materializing the
    [N, E, C] one-hot tensors (round-2 verdict #10: at the 254M config those
    were ~0.7 GB per MoE layer).  Assignment order is bit-identical to the
    GShard one-hot formulation (`moe_ffn_onehot`, kept as the oracle).

    Returns (y, aux_loss) with y in h's shape/dtype and aux_loss a scalar
    fp32 (the Switch load-balance loss; 0-coefficient folds it away)."""
    e, top_k = cfg.n_experts, cfg.expert_top_k
    orig_shape = h.shape
    d = orig_shape[-1]
    x = h.reshape(-1, d)
    n = x.shape[0]
    cap = expert_capacity(n, e, top_k, cfg.capacity_factor)
    prec = jax.lax.Precision.HIGHEST if h.dtype == jnp.float32 else None

    probs, gate_vals, gate_idx, aux = _route(x, layer, cfg)
    rank = _ranks(gate_idx, e)                     # [N, k]
    valid = rank < cap                             # overflow tokens drop
    slot = gate_idx * cap + rank                   # [N, k] in [0, E*C)
    slot_eff = jnp.where(valid, slot, e * cap)     # invalid -> dump row

    # Scatter tokens into the expert buffer (+1 dump row, dropped below).
    # Slots are unique by construction (ranks are a per-expert enumeration,
    # top-k experts are distinct), so `set` scatter-writes race-free.
    # Flattening is k-major on both sides so indices and rows line up.
    x_c = x.astype(cfg.dtype)
    x_rep = jnp.reshape(
        jnp.broadcast_to(x_c[None], (top_k, n, d)), (top_k * n, d)
    )
    xe = jnp.zeros((e * cap + 1, d), cfg.dtype)
    xe = xe.at[jnp.transpose(slot_eff).reshape(-1)].set(x_rep)
    xe = xe[: e * cap].reshape(e, cap, d)
    if mesh is not None and EXPERT_AXIS in mesh.axis_names:
        xe = jax.lax.with_sharding_constraint(
            xe, NamedSharding(mesh, P(EXPERT_AXIS, None, None))
        )

    out = _expert_ffn(xe, layer, cfg, prec)        # [E, C, d]

    # Gather each (token, choice)'s expert output and combine with gates.
    out_flat = out.reshape(e * cap, d)
    rows = out_flat[jnp.where(valid, slot, 0)]     # [N, k, d]
    w = (gate_vals * valid.astype(jnp.float32)).astype(cfg.dtype)
    y = jnp.sum(rows * w[..., None], axis=1)

    return y.reshape(orig_shape).astype(h.dtype), aux


def moe_ffn_onehot(h, layer, cfg, mesh=None):
    """GShard one-hot dispatch/combine ([N, E, C] einsum form) — the
    tiny-scale ORACLE the scatter/gather path is verified against.  Memory
    scales with N*E*C; do not use at production token counts."""
    e, top_k = cfg.n_experts, cfg.expert_top_k
    orig_shape = h.shape
    d = orig_shape[-1]
    x = h.reshape(-1, d)
    n = x.shape[0]
    cap = expert_capacity(n, e, top_k, cfg.capacity_factor)
    prec = jax.lax.Precision.HIGHEST if h.dtype == jnp.float32 else None

    probs, gate_vals, gate_idx, aux = _route(x, layer, cfg)

    combine = jnp.zeros((n, e, cap), jnp.float32)
    counts = jnp.zeros((e,), jnp.int32)
    for k in range(top_k):
        mask = jax.nn.one_hot(gate_idx[:, k], e, dtype=jnp.int32)  # [N, E]
        pos = counts[None, :] + jnp.cumsum(mask, axis=0) - mask  # rank in e
        within = (pos < cap) & (mask > 0)
        slot = jax.nn.one_hot(pos, cap, dtype=jnp.float32)  # [N, E, C]
        combine += (
            gate_vals[:, k, None, None]
            * within[..., None].astype(jnp.float32)
            * mask[..., None].astype(jnp.float32)
            * slot
        )
        counts = counts + jnp.sum(mask, axis=0)

    dispatch = (combine > 0.0).astype(cfg.dtype)  # [N, E, C]
    xe = jnp.einsum("nec,nd->ecd", dispatch, x.astype(cfg.dtype),
                    precision=prec)
    if mesh is not None and EXPERT_AXIS in mesh.axis_names:
        xe = jax.lax.with_sharding_constraint(
            xe, NamedSharding(mesh, P(EXPERT_AXIS, None, None))
        )
    out = _expert_ffn(xe, layer, cfg, prec)
    y = jnp.einsum("nec,ecd->nd", combine.astype(cfg.dtype), out,
                   precision=prec)
    return y.reshape(orig_shape).astype(h.dtype), aux
