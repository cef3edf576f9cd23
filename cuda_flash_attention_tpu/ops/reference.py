"""Pure-JAX reference attention — the correctness oracle.

Capability parity with the reference's vanilla attention kernel
(/root/reference/kernels/vanilla-attn.cu:7-80: materialized S = QK^T/sqrt(d),
full-row softmax, PV) and the PyTorch CPU oracle used by its harness
(/root/reference/test_flash_attention2.py:197-208).  Unlike the CUDA kernel,
this is plain XLA — jnp matmuls hit the MXU directly, and it doubles as both
the numerics oracle and the "vanilla" perf floor in the benchmark suite.

logsumexp semantics match the reference contract
(/root/reference/kernels/kernel_fa2_optimized.cu:339-344):
    lse = log(sum_j exp(s_j - m)) + m      with s = QK^T * sm_scale
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _attention_core(q, k, v, *, causal, sm_scale, compute_dtype,
                    q_segment_ids=None, kv_segment_ids=None, window=None,
                    sinks=0):
    """Materialized softmax(QK^T * scale) V with logsumexp, in compute_dtype."""
    orig_dtype = q.dtype
    q = q.astype(compute_dtype)
    k = k.astype(compute_dtype)
    v = v.astype(compute_dtype)
    # HIGHEST precision: full-fp32 MXU passes, matching the reference's
    # CUDA-cores-only fp32 arithmetic (README.md:8) instead of TPU's default
    # bf16-pass matmul.
    precision = jax.lax.Precision.HIGHEST
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k,
        preferred_element_type=compute_dtype, precision=precision,
    )
    s = s * compute_dtype(sm_scale)
    if causal or window is not None:
        q_len, kv_len = s.shape[-2], s.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
        if causal:
            s = jnp.where(col <= row, s, -jnp.inf)
        if window is not None:
            # Sliding window: query i sees keys j with i - j < window —
            # plus the first `sinks` keys (StreamingLLM attention sinks).
            keep = row - col < window
            if sinks > 0:
                keep = jnp.logical_or(keep, col < sinks)
            s = jnp.where(keep, s, -jnp.inf)
    if q_segment_ids is not None:
        seg = (
            q_segment_ids[:, None, :, None] == kv_segment_ids[:, None, None, :]
        )  # [B, 1, Sq, Skv]
        s = jnp.where(seg, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    # Guard fully-masked rows (can only happen for causal with padded rows).
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(s - m_safe)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p, v,
        preferred_element_type=compute_dtype, precision=precision,
    )
    # Fully-masked rows (possible with segment ids or band windows): O = 0,
    # not NaN — matching the kernels' l == 0 guard — and lse = -inf so a
    # partial-attention merge (parallel/ring.py) gives the row ZERO weight
    # instead of exp(0).
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o = o / l_safe
    lse = jnp.where(
        l[..., 0] == 0.0, -jnp.inf, (jnp.log(l_safe) + m_safe)[..., 0]
    )
    return o.astype(orig_dtype), lse.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "compute_dtype", "window", "sinks",
    ),
)
def vanilla_attention_with_lse(
    q,  # [B, H, Sq, D]
    k,  # [B, H, Skv, D]
    v,  # [B, H, Skv, D]
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    compute_dtype=jnp.float32,
    q_segment_ids=None,   # [B, Sq] int32
    kv_segment_ids=None,  # [B, Skv] int32
    window: int | None = None,
    sinks: int = 0,
):
    """Reference attention returning (O, logsumexp).

    ``sm_scale`` defaults to 1/sqrt(D) (reference: QK^T/sqrt(d) at
    /root/reference/kernels/vanilla-attn.cu:29-42).
    """
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    return _attention_core(
        q, k, v, causal=causal, sm_scale=float(sm_scale),
        compute_dtype=compute_dtype,
        q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
        window=window, sinks=sinks,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "compute_dtype", "window", "sinks",
    ),
)
def vanilla_attention(
    q, k, v, *, causal: bool = False, sm_scale: float | None = None,
    compute_dtype=jnp.float32, q_segment_ids=None, kv_segment_ids=None,
    window: int | None = None, sinks: int = 0,
):
    """Reference attention returning only O — the materialized perf floor."""
    o, _ = vanilla_attention_with_lse(
        q, k, v, causal=causal, sm_scale=sm_scale, compute_dtype=compute_dtype,
        q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
        window=window, sinks=sinks,
    )
    return o


@functools.partial(
    jax.jit, static_argnames=("causal", "sm_scale", "chunk", "return_lse")
)
def vanilla_attention_chunked(
    q, k, v, *, causal: bool = False, sm_scale: float | None = None,
    chunk: int = 512, return_lse: bool = False,
):
    """Oracle attention for long contexts: scores materialized only per
    Q-chunk ([chunk, S_kv] instead of [S_q, S_kv]), so S=32k fits in HBM.
    Same numerics/precision as `vanilla_attention` (HIGHEST, fp32 softmax).

    Differentiable at long context too: each chunk is jax.checkpoint'ed, so
    the lax.map VJP saves only chunk inputs/outputs (O(S*D)) and recomputes
    the [chunk, S_kv] scores in the backward — without this, map's saved
    per-iteration residuals would reassemble the full S x S buffer.

    ``return_lse=True`` also returns logsumexp [B, H, S] with the kernel
    contract lse = log(sum exp(s - m)) + m (fwd-artifact twin of
    vanilla_attention_with_lse for backward-only long-context runs)."""
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    b, h, sq, d = q.shape
    pad = (-sq) % chunk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nc = q.shape[2] // chunk
    qc = q.reshape(b, h, nc, chunk, d).transpose(2, 0, 1, 3, 4)
    precision = jax.lax.Precision.HIGHEST
    kv_len = k.shape[2]

    @jax.checkpoint
    def one_chunk(args):
        qi, idx = args
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qi.astype(jnp.float32), k.astype(jnp.float32),
            preferred_element_type=jnp.float32, precision=precision,
        ) * jnp.float32(sm_scale)
        if causal:
            row = (
                jax.lax.broadcasted_iota(jnp.int32, (chunk, kv_len), 0)
                + idx * chunk
            )
            col = jax.lax.broadcasted_iota(jnp.int32, (chunk, kv_len), 1)
            s = jnp.where(col <= row, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
        p = jnp.exp(s - m_safe)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum(
            "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
            preferred_element_type=jnp.float32, precision=precision,
        )
        return o / l, (jnp.log(l) + m_safe)[..., 0]

    oc, lse_c = jax.lax.map(one_chunk, (qc, jnp.arange(nc)))
    o = oc.transpose(1, 2, 0, 3, 4).reshape(b, h, nc * chunk, d)
    o = o[:, :, :sq, :].astype(q.dtype)
    if not return_lse:
        return o
    lse = lse_c.transpose(1, 2, 0, 3).reshape(b, h, nc * chunk)[:, :, :sq]
    return o, lse


@functools.partial(
    jax.jit, static_argnames=("causal", "sm_scale", "chunked")
)
def reference_attention_grads(q, k, v, do=None, *, causal=False, sm_scale=None,
                              chunked: bool = False):
    """Oracle gradients (dQ, dK, dV) via jax autodiff.

    Mirrors the reference harness's torch-autograd oracle with the simulated
    loss L = sum(O), i.e. dO = 1 when ``do`` is None
    (/root/reference/test_flash_attention2.py:220-250, src/main.cpp:84-92).
    ``chunked=True`` differentiates the Q-chunked oracle instead (checkpointed
    chunks — the long-context gradient oracle; same numerics)."""
    base = vanilla_attention_chunked if chunked else vanilla_attention

    def f(q, k, v):
        o = base(q, k, v, causal=causal, sm_scale=sm_scale)
        if do is None:
            return jnp.sum(o)
        return jnp.sum(o * do)

    return jax.grad(f, argnums=(0, 1, 2))(q, k, v)


# ---------------------------------------------------------------------------
# Independent second oracle.
#
# The reference cross-checks TWO independent implementations: its hand-rolled
# torch-CPU attention AND torch-GPU F.scaled_dot_product_attention restricted
# to the math path (/root/reference/test_flash_attention2.py:197-218).  A bug
# in a single oracle is invisible; the second, independently-written
# implementation closes that hole.  Here the analog is
# `jax.nn.dot_product_attention` (jax's own SDPA, written by a different team
# with a different softmax formulation) — NOT this module's vanilla op.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("causal", "sm_scale"))
def sdpa_attention(q, k, v, *, causal=False, sm_scale=None):
    """Second-oracle forward via jax.nn.dot_product_attention (XLA path).

    Layout adapter only: our kernels speak [B, H, S, D], jax.nn speaks
    [B, S, H, D].  GQA (fewer k/v heads) is supported natively.  Matmul
    precision is pinned to highest — on TPU the DEFAULT precision runs
    fp32 matmuls as single-pass bf16 (~3e-3 error), useless as an oracle."""
    bshd = lambda x: x.transpose(0, 2, 1, 3)  # noqa: E731
    with jax.default_matmul_precision("highest"):
        o = jax.nn.dot_product_attention(
            bshd(q).astype(jnp.float32),
            bshd(k).astype(jnp.float32),
            bshd(v).astype(jnp.float32),
            scale=sm_scale,  # None -> 1/sqrt(D), same convention as ours
            is_causal=causal,
            implementation="xla",
        )
    return bshd(o).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "sm_scale"))
def sdpa_attention_grads(q, k, v, do=None, *, causal=False, sm_scale=None):
    """Second-oracle gradients: autodiff THROUGH jax.nn.dot_product_attention
    (independent of reference_attention_grads' vanilla formulation)."""

    def f(q, k, v):
        o = sdpa_attention(q, k, v, causal=causal, sm_scale=sm_scale)
        if do is None:
            return jnp.sum(o)
        return jnp.sum(o * do)

    return jax.grad(f, argnums=(0, 1, 2))(q, k, v)
