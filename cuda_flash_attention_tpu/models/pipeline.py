"""Pipeline parallelism (PP): GPipe microbatching over the "pipe" mesh axis.

No reference counterpart (single-GPU kernel library, SURVEY.md §2); this is
the PP member of the parallelism set (DP/TP/SP/EP/PP).  TPU-first design:

  * layers are STACKED into [n_stages, layers_per_stage, ...] pytrees and
    sharded over "pipe" — each device holds one contiguous stage.
  * the schedule is a `lax.scan` over T = n_micro + n_stages - 1 ticks
    inside a shard_map: every tick each stage applies its layers to the
    activation in front of it, then a single `lax.ppermute` shifts
    activations one stage down the line (the truncated permutation delivers
    zeros into stage 0's buffer — exactly the "no predecessor" semantics,
    no special-casing).
  * backward: `jax.grad` differentiates straight through the scan+ppermute,
    yielding the reversed-schedule backward pipeline automatically — and it
    stays deterministic by construction like the rest of the framework.

Tick work that does not belong to a stage (embed on stage>0, head on
stage<S-1) is computed-and-masked rather than branched — the SPMD program
stays identical on every device, which keeps XLA's collectives matched.
The waste is one embed+head per tick; the pipeline bubble is the usual
(S-1)/(M+S-1) fraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from cuda_flash_attention_tpu.models.transformer import (
    TransformerConfig,
    _attention_block,
    _dense,
    ffn_block,
    rms_norm,
    rope,
)
from cuda_flash_attention_tpu.parallel.mesh import MODEL_AXIS, PIPE_AXIS


def stack_pipeline_params(params, n_stages: int):
    """Rearrange a flagship param pytree for PP: the per-layer dicts stack
    into [n_stages, layers_per_stage, ...] leaves (requires homogeneous
    layers — use n_experts=0 or moe_every=1 so every layer has the same
    param structure)."""
    from cuda_flash_attention_tpu.models.transformer import stack_layer_params

    layers = params["layers"]
    n_layers = len(layers)
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers do not split into {n_stages} stages")
    try:
        stacked = stack_layer_params(layers)
    except ValueError as e:
        raise ValueError(
            "pipeline stages need homogeneous layers (same param keys); "
            "use moe_every=1 or n_experts=0"
        ) from e
    stacked = jax.tree.map(
        lambda x: x.reshape(n_stages, n_layers // n_stages, *x.shape[1:]),
        stacked,
    )
    return {
        "embed": params["embed"],
        "stages": stacked,
        "final_norm": params["final_norm"],
        "lm_head": params["lm_head"],
    }


# TP placement of stacked stage weights ([n_stages, layers_per_stage, ...]):
# which trailing dim the "model" axis shards, per param key (mirrors
# transformer.param_shardings — QKV/gate/up column-, O/down row-sharded).
_STAGE_TP_DIM = {
    "wq": -1, "wk": -1, "wv": -1, "w_gate": -1, "w_up": -1,
    "wo": -2, "w_down": -2,
}


def _stage_spec(key, ndim, model):
    spec = [PIPE_AXIS] + [None] * (ndim - 1)
    if model is not None and key in _STAGE_TP_DIM:
        spec[_STAGE_TP_DIM[key] + ndim] = model
    return P(*spec)


def pipeline_param_shardings(mesh, pp_params):
    """NamedShardings for a stacked pipeline pytree: stage dim over "pipe";
    when the mesh also carries a "model" axis, stage weights additionally
    shard TP-style (QKV/gate/up column-, O/down row-sharded) and the stage
    compute runs head-parallel with a psum after wo/w_down (PP x TP)."""
    model = MODEL_AXIS if MODEL_AXIS in mesh.axis_names else None

    def rep(x):
        return NamedSharding(mesh, P(*([None] * x.ndim)))

    return {
        "embed": rep(pp_params["embed"]),
        "stages": {
            # Nested (MoE) subtrees stay pipe-sharded only: PP x TP covers
            # the dense stage body; EP composes via models/moe.py instead.
            k: jax.tree.map(
                lambda x, _k=k: NamedSharding(
                    mesh,
                    _stage_spec(
                        _k if isinstance(v, jax.Array) else "", x.ndim, model
                    ),
                ),
                v,
            )
            for k, v in pp_params["stages"].items()
        },
        "final_norm": rep(pp_params["final_norm"]),
        "lm_head": rep(pp_params["lm_head"]),
    }


def _tp_layer(x, layer, positions, cfg, interpret):
    """One dense transformer layer with TP-sharded weights INSIDE the
    pipeline shard_map: this device holds 1/tp of the heads (wq/wk/wv
    column shards) and of d_ff (gate/up); wo/w_down row shards make the
    local matmuls partial sums finished by one psum over "model" each —
    the standard Megatron-style pair, composed with the PP schedule."""
    tp = lax.axis_size(MODEL_AXIS)
    nh = cfg.n_heads // tp
    nkv = cfg.n_kv_heads // tp
    b, s, _ = x.shape
    h = rms_norm(x, layer["attn_norm"])
    q = _dense(h, layer["wq"]).reshape(b, s, nh, cfg.head_dim)
    k = _dense(h, layer["wk"]).reshape(b, s, nkv, cfg.head_dim)
    v = _dense(h, layer["wv"]).reshape(b, s, nkv, cfg.head_dim)
    q = rope(q, positions, *cfg.rope_args).transpose(0, 2, 1, 3)
    k = rope(k, positions, *cfg.rope_args).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    from cuda_flash_attention_tpu.kernels.attention import flash_attention

    o = flash_attention(q, k, v, causal=True, tile_dtype=cfg.attn_tile_dtype,
                        window=cfg.attn_window, interpret=interpret)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, nh * cfg.head_dim)
    x = x + lax.psum(_dense(o, layer["wo"]), MODEL_AXIS).astype(x.dtype)
    h = rms_norm(x, layer["mlp_norm"])
    gate = jax.nn.silu(_dense(h, layer["w_gate"]))
    up = _dense(h, layer["w_up"])
    y = lax.psum(_dense(gate * up, layer["w_down"]), MODEL_AXIS)
    return x + y.astype(x.dtype)


def _stage_apply_tp(x, stage_layers, positions, cfg, interpret):
    """TP twin of _stage_apply (dense layers only; aux is 0)."""

    def body(x, layer):
        return _tp_layer(x, layer, positions, cfg, interpret), None

    x, _ = lax.scan(body, x, stage_layers)
    return x, jnp.float32(0.0)


def _stage_apply(x, stage_layers, positions, cfg, interpret):
    """Apply this stage's stacked layers (scan over the layer dim).
    Returns (x, aux) — aux is this stage's summed MoE router aux loss
    (0.0 for dense stages), matching ffn_block's contract."""

    def body(carry, layer):
        x, aux = carry
        x = _attention_block(x, layer, positions, cfg, None,
                             window=cfg.attn_window, interpret=interpret)
        x, a = ffn_block(x, layer, cfg, None)
        return (x, aux + a), None

    (x, aux), _ = lax.scan(body, (x, jnp.float32(0.0)), stage_layers)
    return x, aux


def make_pipeline_nll(cfg: TransformerConfig, mesh, n_stages: int,
                      n_micro: int):
    """Returns nll(pp_params, tokens [B, S]) -> (per-token next-token NLL
    [n_micro, B/n_micro, S] (last column zero-padded), summed MoE router
    aux loss over all layers x microbatches — 0.0 for dense models),
    computed by the GPipe schedule over mesh's "pipe" axis."""
    if mesh.shape[PIPE_AXIS] != n_stages:
        raise ValueError(
            f"mesh pipe axis {mesh.shape[PIPE_AXIS]} != n_stages {n_stages}"
        )
    if cfg.attn_window is not None and cfg.global_every > 0:
        raise NotImplementedError(
            "PP scans homogeneous stacked layers; the local/global "
            "interleave (global_every > 0) is not expressible there — "
            "use a uniform attn_window under PP"
        )
    shift = [(i, i + 1) for i in range(n_stages - 1)]
    from cuda_flash_attention_tpu.parallel.sharded import mesh_interpret_default

    interpret = mesh_interpret_default(mesh)
    tp = mesh.shape.get(MODEL_AXIS, 1)
    model = MODEL_AXIS if tp > 1 else None
    if tp > 1 and (cfg.n_heads % tp or cfg.n_kv_heads % tp or cfg.d_ff % tp):
        raise ValueError(
            f"PP x TP needs the model-axis size {tp} to divide n_heads "
            f"({cfg.n_heads}), n_kv_heads ({cfg.n_kv_heads}) and d_ff "
            f"({cfg.d_ff})"
        )

    def stage_specs_fn(tree):
        return {
            k: jax.tree.map(
                lambda x: _stage_spec(
                    k if isinstance(v, jax.Array) else "", x.ndim, model
                ),
                v,
            )
            for k, v in tree.items()
        }

    def nll_fn(pp_params, tokens):
        b, s = tokens.shape
        if b % n_micro:
            raise ValueError(f"batch {b} must divide into {n_micro} microbatches")
        if tp > 1 and "router" in pp_params["stages"]:
            raise ValueError(
                "PP x TP supports dense stages only; MoE layers compose "
                "with EP (models/moe.py), not the model axis"
            )
        mb = b // n_micro
        micro = tokens.reshape(n_micro, mb, s)
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (mb, s))

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(
                stage_specs_fn(pp_params["stages"]),
                P(), P(), P(), P(), P(),
            ),
            out_specs=P(),
            check_vma=False,
        )
        def _pp(stages_local, embed, final_norm, lm_head, micro, positions):
            # stages_local leaves: [1, layers_per_stage, ...] -> squeeze.
            stage_layers = jax.tree.map(lambda x: x[0], stages_local)
            stage = lax.axis_index(PIPE_AXIS)
            is_first = stage == 0
            is_last = stage == n_stages - 1

            t_total = n_micro + n_stages - 1
            buf0 = jnp.zeros((mb, s, cfg.d_model), cfg.dtype)
            outs0 = jnp.zeros((n_micro, mb, s), jnp.float32)

            def tick(carry, t):
                buf, outs, aux_acc = carry
                m_idx = jnp.clip(t, 0, n_micro - 1)
                mtok = lax.dynamic_index_in_dim(micro, m_idx, 0, False)
                x0 = embed[mtok].astype(cfg.dtype)
                x_in = jnp.where(is_first, x0, buf)
                apply = _stage_apply_tp if tp > 1 else _stage_apply
                y, aux = apply(x_in, stage_layers, positions, cfg, interpret)
                # This stage holds real data for microbatch t-stage only
                # while t is inside its fill window; aux from the masked
                # fill/drain ticks (recomputed garbage) must not count.
                aux_valid = (t >= stage) & (t < stage + n_micro)
                aux_acc = aux_acc + jnp.where(aux_valid, aux, 0.0)

                # The last stage finalizes microbatch t - (n_stages - 1)
                # once the pipe is full: reduce to per-token NLL right here
                # so the carry never holds [.., vocab] logits.
                h = rms_norm(y, final_norm)
                logits = _dense(h, lm_head).astype(jnp.float32)
                out_idx = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
                otok = lax.dynamic_index_in_dim(micro, out_idx, 0, False)
                logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
                nll = -jnp.take_along_axis(
                    logp, otok[:, 1:, None], axis=-1
                )[..., 0]  # [mb, s-1]
                nll = jnp.pad(nll, ((0, 0), (0, 1)))
                valid = is_last & (t >= n_stages - 1)
                prev = lax.dynamic_index_in_dim(outs, out_idx, 0, False)
                outs = lax.dynamic_update_index_in_dim(
                    outs, jnp.where(valid, nll, prev), out_idx, 0
                )
                buf = lax.ppermute(y, PIPE_AXIS, shift)
                return (buf, outs, aux_acc), None

            (_, outs, aux_acc), _ = lax.scan(
                tick, (buf0, outs0, jnp.float32(0.0)), jnp.arange(t_total)
            )
            # Only the last stage holds real NLLs; psum replicates them.
            # aux is summed over stages (each stage's layers count once).
            outs = jnp.where(is_last, outs, 0.0)
            return lax.psum(outs, PIPE_AXIS), lax.psum(aux_acc, PIPE_AXIS)

        return _pp(
            pp_params["stages"], pp_params["embed"],
            pp_params["final_norm"], pp_params["lm_head"], micro, positions,
        )

    return nll_fn


def make_pp_loss_fn(cfg: TransformerConfig, mesh, n_stages: int,
                    n_micro: int):
    """loss(pp_params, tokens) — mean next-token NLL over all microbatches;
    matches models.loss_fn's value for the same (unstacked) params."""
    nll_fn = make_pipeline_nll(cfg, mesh, n_stages, n_micro)

    def loss(pp_params, tokens):
        nll, aux = nll_fn(pp_params, tokens)  # [n_micro, mb, s], scalar
        s = tokens.shape[1]
        mean_nll = jnp.sum(nll) / (nll.shape[0] * nll.shape[1] * (s - 1))
        # loss_fn adds coef * (aux summed over layers) for the whole batch;
        # under microbatching each microbatch contributed its own aux, so
        # the batch-equivalent term is the mean over microbatches.
        return mean_nll + cfg.router_aux_coef * aux / nll.shape[0]

    return loss


def make_pp_train_step(cfg: TransformerConfig, mesh, n_stages: int,
                       n_micro: int, learning_rate: float = 1e-3):
    """SGD-momentum train step over stacked pipeline params (grads flow
    through the scan+ppermute schedule — the backward pipeline)."""
    loss_fn = make_pp_loss_fn(cfg, mesh, n_stages, n_micro)

    def step(pp_params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(pp_params, tokens)
        new_opt = jax.tree.map(
            lambda m, g: 0.9 * m + g.astype(jnp.float32), opt_state, grads
        )
        new_params = jax.tree.map(
            lambda p, m: (p - learning_rate * m).astype(p.dtype),
            pp_params, new_opt,
        )
        return new_params, new_opt, loss

    return step
