"""Round-5: attack the D=128 forward rowsum gap (ROOFLINE.md: fwd 147 TF
vs bwd 178 TF at S=2048 — ~5 us/cell of exposed VPU reduction because no
idle MXU output lane exists for fold-rowsum at D=128).

Variants, all at the bench shape B4 H8 S2048 D128 bf16, single KV block per
(b, h) cell (the measured block optimum):

  v0_current   jnp.sum(p, axis=1, dtype=f32) — as shipped
  v1_mxu_ones  l = P @ ones column via one extra MXU pass
  v2_lane_part l accumulated as [bq, 128] lane partials (elementwise adds),
               ONE cross-lane reduce at the end
  v3_bf16_sum  jnp.sum(p, axis=1) in bf16 accumulate... (precision probe)
  v4_split_kv  2 KV chunks inside the body (overlap probe: chunk i+1's
               QK^T can issue while chunk i's rowsum runs)

Each variant reports device ms (profiler) + max|O - oracle|.

Usage (on the chip):  python scripts/r5_d128_fwd.py
"""

import functools
import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_flash_attention_tpu.kernels.common import LN2, LOG2E
from cuda_flash_attention_tpu.utils.profiling import profile_ops

B, H, S, D = 4, 8, 2048, 128
SM = 1.0 / (D ** 0.5)
_skip = re.compile(r"%?(copy|bitcast|tuple|fusion\.\d+ = \(\))")


def _core(q_ref, k_ref, v_ref, o_ref, lse_ref, *, variant):
    c = SM * LOG2E
    q = (q_ref[0, 0].astype(jnp.float32) * c).astype(jnp.bfloat16)
    k = k_ref[0, 0]
    if variant == "v4_split_kv":
        half = S // 2
        m_run = jnp.full((q.shape[0], 1), -jnp.inf, jnp.float32)
        l_run = jnp.zeros((q.shape[0], 1), jnp.float32)
        acc = jnp.zeros((q.shape[0], D), jnp.float32)
        for i in range(2):
            ks = k_ref[0, 0, i * half:(i + 1) * half]
            vs = v_ref[0, 0, i * half:(i + 1) * half]
            s = lax.dot_general(
                q, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_cur = jnp.max(s, axis=1)[:, None]
            m_new = jnp.maximum(m_run, m_cur)
            alpha = jnp.exp2(m_run - m_new)
            p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
            l_run = alpha * l_run + jnp.sum(p, axis=1, dtype=jnp.float32)[:, None]
            pv = lax.dot_general(
                p, vs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc * alpha + pv
            m_run = m_new
        l_inv = jnp.where(l_run == 0.0, 1.0, 1.0 / l_run)
        o_ref[0, 0] = (acc * l_inv).astype(o_ref.dtype)
        lse_ref[0, 0] = m_run * LN2 + jnp.log(jnp.where(l_run == 0, 1.0, l_run))
        return

    s = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    m = jnp.max(s, axis=1)[:, None]
    p = jnp.exp2((s - m).astype(jnp.bfloat16))
    v = v_ref[0, 0]
    pv = lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    if variant == "v0_current":
        l = jnp.sum(p, axis=1, dtype=jnp.float32)[:, None]
    elif variant == "v1_mxu_ones":
        ones = jnp.ones((S, 8), jnp.bfloat16)
        l = lax.dot_general(
            p, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :1]
    elif variant == "v2_lane_part":
        part = p[:, :128].astype(jnp.float32)
        for i in range(1, S // 128):
            part = part + p[:, i * 128:(i + 1) * 128]
        l = jnp.sum(part, axis=1)[:, None]
    elif variant == "v3_bf16_sum":
        l = jnp.sum(p, axis=1).astype(jnp.float32)[:, None]
    else:
        raise ValueError(variant)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (pv * l_inv).astype(o_ref.dtype)
    lse_ref[0, 0] = m * LN2 + jnp.log(jnp.where(l == 0.0, 1.0, l))


@functools.partial(jax.jit, static_argnames=("variant",))
def fwd(q, k, v, variant):
    kern = functools.partial(_core, variant=variant)
    return pl.pallas_call(
        kern,
        grid=(B, H),
        in_specs=[pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0))] * 3,
        out_specs=(
            pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S, 1), lambda b, h: (b, h, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, S, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, H, S, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v)


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16) for kk in ks)
    flops = 4 * B * H * S * S * D

    from cuda_flash_attention_tpu.kernels.attention import (
        flash_attention_with_lse,
    )
    o_ref, _ = flash_attention_with_lse(q, k, v, force_kernel=True)
    o_ref = o_ref.astype(jnp.float32)

    for variant in ("v0_current", "v1_mxu_ones", "v2_lane_part",
                    "v3_bf16_sum", "v4_split_kv"):
        try:
            o, _ = fwd(q, k, v, variant)
            err = float(jnp.abs(o.astype(jnp.float32) - o_ref).max())
            ops = profile_ops(lambda q, k, v: fwd(q, k, v, variant),
                              q, k, v, iters=4)
            ms = sum(op.mean_ms for op in ops if not _skip.match(op.name))
            print(f"{variant:14s} {ms:7.3f} ms  {flops/ms/1e9:6.1f} TF  "
                  f"err {err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"{variant:14s} FAILED: {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()
