"""Flagship model: GQA decoder-only transformer on the Pallas FA2 kernels.

The reference is a kernel library with no model layer (SURVEY.md §2); this is
the TPU-first model family the north star requires (causal GQA attention,
the substrate for the quantized decode engine and multi-host scaling).

Design:
  * pure-JAX functional: params are a plain pytree; `forward`/`loss_fn` are
    jit-friendly functions — transparent to pjit sharding and shard_map.
  * mixed pjit + shard_map: dense matmuls run under the jit partitioner with
    sharding constraints; attention runs as a shard_map island over the
    Pallas kernel (head-parallel TP over "model", sequence-parallel ring
    over "ctx" when the mesh has one).
  * RMSNorm + RoPE + SwiGLU; bf16 activations, fp32 params/optimizer.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cuda_flash_attention_tpu.kernels.attention import flash_attention
from cuda_flash_attention_tpu.parallel.mesh import (
    CTX_AXIS,
    DATA_AXIS,
    MODEL_AXIS,
)
from cuda_flash_attention_tpu.parallel.ring import ring_attention
from cuda_flash_attention_tpu.parallel.sharded import (
    head_parallel_attention,
    mesh_interpret_default,
)
from cuda_flash_attention_tpu.quant.linear import dense as _dense


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 32768
    d_model: int = 1024
    n_layers: int = 8
    n_heads: int = 16
    n_kv_heads: int = 8
    head_dim: int = 64
    d_ff: int = 4096
    rope_theta: float = 10000.0
    dtype: jnp.dtype = jnp.bfloat16       # activation dtype
    param_dtype: jnp.dtype = jnp.float32
    attn_tile_dtype: jnp.dtype | None = jnp.bfloat16  # kernel tile precision
    # Mixture-of-Experts (models/moe.py): n_experts=0 keeps every layer's
    # dense SwiGLU; n_experts>0 replaces the MLP of every `moe_every`-th
    # layer (odd layers with moe_every=2, the standard interleave).
    n_experts: int = 0
    expert_top_k: int = 2
    capacity_factor: float = 1.25
    moe_every: int = 2
    router_aux_coef: float = 0.01
    # Sliding-window attention (kernels/attention.py `window`): attn_window
    # None keeps every layer global; attn_window=W restricts each query to
    # the last W keys.  global_every > 0 keeps every `global_every`-th layer
    # global (the local/global interleave of Gemma-2/GPT-OSS-style stacks:
    # with global_every=2, odd layers are global) so long-range information
    # still propagates while most layers pay O(S*W) attention.
    attn_window: int | None = None
    global_every: int = 0
    # StreamingLLM attention sinks: with a window, the first `attn_sinks`
    # tokens stay attendable forever (their pages are never recycled) —
    # the bounded-cache recipe for unbounded-length generation.
    attn_sinks: int = 0
    # Long-context RoPE extension: "none"; "linear" (position
    # interpolation: positions divided by rope_scale_factor, fine-tune
    # briefly at the longer length); "ntk" (NTK-aware: the base theta is
    # inflated so low frequencies stretch while high frequencies — local
    # order — stay intact; usable zero-shot).  Factor = target_len /
    # trained_len.
    rope_scaling: str = "none"
    rope_scale_factor: float = 1.0
    # Rematerialization (jax.checkpoint) of the per-layer forward under
    # autodiff — trades recompute FLOPs for activation memory so bigger
    # B*S fits HBM (the task's remat requirement; the reference has no
    # training path to compare).  "none": save everything; "full":
    # recompute the whole layer (incl. the FA2 kernel forward) in the
    # backward; "dots": checkpoint_dots_with_no_batch_dims policy — saves
    # matmul outputs, recomputes the cheap elementwise chain.
    remat: str = "none"

    def __post_init__(self):
        assert self.n_heads % self.n_kv_heads == 0

    def is_moe_layer(self, i: int) -> bool:
        return self.n_experts > 0 and i % self.moe_every == self.moe_every - 1

    @property
    def rope_args(self) -> tuple[float, float]:
        """(effective theta, position divisor) for `rope` under the
        configured long-context scaling."""
        if self.rope_scaling == "none" or self.rope_scale_factor == 1.0:
            return (self.rope_theta, 1.0)
        if self.rope_scaling == "linear":
            return (self.rope_theta, float(self.rope_scale_factor))
        if self.rope_scaling == "ntk":
            d = self.head_dim
            theta = self.rope_theta * self.rope_scale_factor ** (d / (d - 2))
            return (float(theta), 1.0)
        raise ValueError(f"unknown rope_scaling {self.rope_scaling!r}")

    def layer_window(self, i: int) -> int | None:
        """Sliding window for layer i, or None when the layer is global."""
        if self.attn_window is None:
            return None
        if self.global_every > 0 and i % self.global_every == self.global_every - 1:
            return None
        return self.attn_window

    @property
    def q_dim(self) -> int:
        return self.n_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim

    @classmethod
    def tiny(cls) -> "TransformerConfig":
        """Tiny config for CPU-mesh dry runs and tests."""
        return cls(
            vocab_size=256, d_model=128, n_layers=2, n_heads=4, n_kv_heads=2,
            head_dim=64, d_ff=256,
        )

    @classmethod
    def base(cls) -> "TransformerConfig":
        """~250M-param production-shape config (single v5e chip)."""
        return cls(
            vocab_size=32768, d_model=1024, n_layers=12, n_heads=16,
            n_kv_heads=8, head_dim=64, d_ff=4096,
        )

    @classmethod
    def tiny_moe(cls, n_experts: int = 4) -> "TransformerConfig":
        """Tiny MoE config (layer 1 is MoE) for EP dry runs and tests."""
        return cls(
            vocab_size=256, d_model=128, n_layers=2, n_heads=4, n_kv_heads=2,
            head_dim=64, d_ff=256, n_experts=n_experts,
        )


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def init_params(key, cfg: TransformerConfig):
    def dense(key, shape, scale=None):
        if scale is None:
            scale = shape[0] ** -0.5
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(
            cfg.param_dtype
        )

    keys = jax.random.split(key, cfg.n_layers + 3)
    layers = []
    for i in range(cfg.n_layers):
        ks = jax.random.split(keys[i], 8)
        layer = {
            "attn_norm": jnp.ones((cfg.d_model,), cfg.param_dtype),
            "wq": dense(ks[0], (cfg.d_model, cfg.q_dim)),
            "wk": dense(ks[1], (cfg.d_model, cfg.kv_dim)),
            "wv": dense(ks[2], (cfg.d_model, cfg.kv_dim)),
            "wo": dense(ks[3], (cfg.q_dim, cfg.d_model)),
        }
        if cfg.is_moe_layer(i):
            from cuda_flash_attention_tpu.models.moe import init_moe_layer

            layer.update(init_moe_layer(ks[7], cfg))
        else:
            layer.update({
                "mlp_norm": jnp.ones((cfg.d_model,), cfg.param_dtype),
                "w_gate": dense(ks[4], (cfg.d_model, cfg.d_ff)),
                "w_up": dense(ks[5], (cfg.d_model, cfg.d_ff)),
                "w_down": dense(ks[6], (cfg.d_ff, cfg.d_model)),
            })
        layers.append(layer)
    return {
        "embed": dense(keys[-3], (cfg.vocab_size, cfg.d_model), scale=1.0),
        "layers": layers,
        "final_norm": jnp.ones((cfg.d_model,), cfg.param_dtype),
        "lm_head": dense(keys[-2], (cfg.d_model, cfg.vocab_size)),
    }


def stack_layer_params(layers):
    """Stack a homogeneous per-layer param list into one pytree with a
    leading layer dim — the layout `lax.scan`-based layer loops consume
    (decode_step's scanned fast path; pipeline stages use the same trick).
    Raises on heterogeneous layers (e.g. MoE interleave)."""
    keys = set(layers[0].keys())
    for l in layers[1:]:
        if set(l.keys()) != keys:
            raise ValueError(
                "stack_layer_params needs homogeneous layers (same param "
                "keys); MoE-interleaved models (moe_every>1) cannot stack"
            )
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def stacked_param_shardings(mesh, cfg: TransformerConfig):
    """param_shardings for a pytree whose "layers" entry is stacked
    (stack_layer_params): per-layer specs gain a leading None (layer) dim."""
    base = param_shardings(mesh, cfg)
    layer0 = base["layers"][0]
    stacked = jax.tree.map(
        lambda ns: NamedSharding(mesh, P(None, *ns.spec)), layer0,
        is_leaf=lambda x: isinstance(x, NamedSharding),
    )
    return {**base, "layers": stacked}


def param_shardings(mesh, cfg: TransformerConfig):
    """NamedShardings for TP ("model" axis) placement of the param pytree:
    QKV/gate/up column-sharded, O/down row-sharded, norms replicated."""
    model = MODEL_AXIS if MODEL_AXIS in mesh.axis_names else None

    def ns(spec):
        return NamedSharding(mesh, spec)

    attn = {
        "attn_norm": ns(P(None)),
        "wq": ns(P(None, model)),
        "wk": ns(P(None, model)),
        "wv": ns(P(None, model)),
        "wo": ns(P(model, None)),
    }
    dense_mlp = {
        "mlp_norm": ns(P(None)),
        "w_gate": ns(P(None, model)),
        "w_up": ns(P(None, model)),
        "w_down": ns(P(model, None)),
    }
    layers = []
    for i in range(cfg.n_layers):
        layer = dict(attn)
        if cfg.is_moe_layer(i):
            from cuda_flash_attention_tpu.models.moe import moe_layer_shardings

            layer.update(moe_layer_shardings(mesh, cfg))
        else:
            layer.update(dense_mlp)
        layers.append(layer)
    return {
        "embed": ns(P(None, None)),
        "layers": layers,
        "final_norm": ns(P(None)),
        "lm_head": ns(P(None, model)),
    }


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rms_norm(x, scale, eps: float = 1e-6):
    """Statistics in fp32; output in x's dtype (the fp32 scale param must
    not silently promote the bf16 residual stream — it would turn every
    downstream op fp32, including pipeline-stage carries)."""
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    normed = x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)).astype(x.dtype)


def rope(x, positions, theta: float, pos_scale: float = 1.0):
    """Half-rotation RoPE. x: [B, S, H, D]; positions: [B, S].

    ``pos_scale`` > 1 is linear position interpolation (positions divided
    by the scale — the PI long-context extension); NTK-aware scaling
    instead inflates ``theta`` (see TransformerConfig.rope_args)."""
    d = x.shape[-1]
    half = d // 2
    freqs = jnp.exp(
        -jnp.log(theta) * jnp.arange(0, half, dtype=jnp.float32) / half
    )
    angles = (
        positions[..., None].astype(jnp.float32) / pos_scale
    ) * freqs  # [B, S, half]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return rotated.astype(x.dtype)


def gqa_flash_attention(q, k, v, *, cfg: TransformerConfig, mesh=None,
                        causal: bool = True, window: int | None = None,
                        interpret=None):
    """Grouped-query attention over the FA2 kernel.

    q: [B, Hq, S, D]; k/v: [B, Hkv, S, D].  GQA is kernel-native: the FA2
    BlockSpec index maps route query head h to KV head h // group, so KV is
    read from HBM exactly once regardless of the group size (no repeated-KV
    materialization — the bandwidth win GQA exists for).

    Exception: a mesh whose model axis does not divide the KV head count
    (tp > Hkv) can't shard unexpanded KV, so KV is broadcast to the query
    head count there — correctness over bandwidth for that topology."""
    sinks = cfg.attn_sinks if window is not None else 0
    tile = cfg.attn_tile_dtype
    if mesh is not None and MODEL_AXIS in mesh.axis_names:
        tp = mesh.shape[MODEL_AXIS]
        if k.shape[1] % tp != 0:
            groups = q.shape[1] // k.shape[1]
            k = jnp.repeat(k, groups, axis=1)
            v = jnp.repeat(v, groups, axis=1)
    if mesh is None:
        return flash_attention(q, k, v, causal=causal, tile_dtype=tile,
                               window=window, sinks=sinks,
                               interpret=interpret)
    if CTX_AXIS in mesh.axis_names and mesh.shape[CTX_AXIS] > 1:
        if sinks:
            raise NotImplementedError(
                "attention sinks + context parallelism: the sink shard's "
                "position in the ring varies per device (non-static) — use "
                "a mesh without a ctx axis for sink layers"
            )
        # The ring decomposes a global window into a windowed-causal
        # diagonal step plus per-shard recency bands, and SKIPS rotations
        # entirely behind the window (parallel/ring.py) — windowed layers
        # cost O(window), not O(S), in both MXU and ICI terms.
        return ring_attention(mesh, q, k, v, causal=causal, tile_dtype=tile,
                              window=window)
    return head_parallel_attention(mesh, q, k, v, causal=causal, tile_dtype=tile,
                                   window=window, sinks=sinks)


def _attention_block(x, layer, positions, cfg: TransformerConfig, mesh,
                     window: int | None = None, interpret=None):
    b, s, _ = x.shape
    h = rms_norm(x, layer["attn_norm"])
    q = _dense(h, layer["wq"]).reshape(b, s, cfg.n_heads, cfg.head_dim)
    k = _dense(h, layer["wk"]).reshape(b, s, cfg.n_kv_heads, cfg.head_dim)
    v = _dense(h, layer["wv"]).reshape(b, s, cfg.n_kv_heads, cfg.head_dim)
    q = rope(q, positions, *cfg.rope_args).transpose(0, 2, 1, 3)
    k = rope(k, positions, *cfg.rope_args).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    o = gqa_flash_attention(q, k, v, cfg=cfg, mesh=mesh, causal=True,
                            window=window, interpret=interpret)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.q_dim)
    return x + _dense(o, layer["wo"])


def ffn_block(x, layer, cfg: TransformerConfig, mesh=None):
    """Residual FFN: dense SwiGLU or MoE (when the layer carries MoE
    params).  Returns (x, aux_loss) — aux is 0.0 for dense layers."""
    h = rms_norm(x, layer["mlp_norm"])
    if "router" in layer:
        from cuda_flash_attention_tpu.models.moe import moe_ffn

        y, aux = moe_ffn(h, layer, cfg, mesh=mesh)
        return x + y, aux
    gate = jax.nn.silu(_dense(h, layer["w_gate"]))
    up = _dense(h, layer["w_up"])
    return x + _dense(gate * up, layer["w_down"]).astype(x.dtype), 0.0



def _activation_spec(mesh):
    data = DATA_AXIS if (mesh and DATA_AXIS in mesh.axis_names) else None
    ctx = CTX_AXIS if (mesh and CTX_AXIS in mesh.axis_names) else None
    return P(data, ctx, None)


def forward(params, tokens, cfg: TransformerConfig, mesh=None,
            return_aux: bool = False):
    """Causal LM forward: tokens [B, S] int32 -> logits [B, S, vocab].
    With return_aux=True returns (logits, aux) where aux is the summed MoE
    router load-balance loss (0.0 for dense models)."""
    b, s = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    # Gather THEN convert: casting the whole [vocab, d] table costs a
    # full-table HBM pass per step (profiled 0.3 ms at vocab 32k).
    x = params["embed"][tokens].astype(cfg.dtype)
    if mesh is not None:
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, _activation_spec(mesh))
        )
    def _layer(x, layer, window):
        x = _attention_block(x, layer, positions, cfg, mesh, window=window)
        return ffn_block(x, layer, cfg, mesh)

    if cfg.remat == "full":
        _layer = jax.checkpoint(_layer, static_argnums=(2,))
    elif cfg.remat == "dots":
        _layer = jax.checkpoint(
            _layer,
            policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
            static_argnums=(2,),
        )
    elif cfg.remat != "none":
        raise ValueError(f"unknown remat policy {cfg.remat!r}")

    aux_total = 0.0
    for i, layer in enumerate(params["layers"]):
        x, aux = _layer(x, layer, cfg.layer_window(i))
        aux_total = aux_total + aux
    x = rms_norm(x, params["final_norm"])
    logits = _dense(x, params["lm_head"]).astype(jnp.float32)
    return (logits, aux_total) if return_aux else logits


def loss_fn(params, tokens, cfg: TransformerConfig, mesh=None):
    """Next-token cross entropy (tokens serve as both input and target),
    plus the MoE router auxiliary loss when the model has experts.

    Fused CE form: nll = logsumexp(logits) - logits[target].  The
    log_softmax formulation materializes a SECOND [B, S, vocab] fp32
    tensor (1 GB at B4/S2048/V32k) plus a gather pass over it; this form
    reduces straight off the logits — round-5 train-step profiling found
    the logp materialization among the top non-matmul ops."""
    logits, aux = forward(params, tokens[:, :-1], cfg, mesh, return_aux=True)
    targets = tokens[:, 1:]
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    target_logit = jnp.take_along_axis(
        logits, targets[..., None], axis=-1
    )[..., 0]
    return jnp.mean(lse - target_logit) + cfg.router_aux_coef * aux


def make_train_step(cfg: TransformerConfig, mesh=None, learning_rate=1e-3):
    """SGD-with-momentum train step (optimizer state = momentum pytree) —
    jittable, shardable; returns (params, opt_state, loss)."""

    def train_step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, cfg, mesh)
        new_opt = jax.tree.map(
            lambda m, g: 0.9 * m + g.astype(jnp.float32), opt_state, grads
        )
        new_params = jax.tree.map(
            lambda p, m: (p - learning_rate * m).astype(p.dtype), params, new_opt
        )
        return new_params, new_opt, loss

    return train_step


def init_opt_state(params):
    return jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
