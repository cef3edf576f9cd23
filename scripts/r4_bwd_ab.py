"""Round-4 A/B: fp32 backward 2-pass vs 3-pass lane-packed emulation.

Measures on the real chip: device time (profiler) + max-abs grad error vs
the fp32 oracle, for the Stress-1 bench shape (time) and Medium-1 (error).

HISTORICAL NOTE: the 3-pass arm keyed off a CFA_BWD_EXACT env var (an
`exact=` parameter in fa2_backward) that was DELETED after the A/B showed
identical grad error at 1.5x the cost (docs/ROOFLINE.md).  As committed,
this script can only run the surviving 2-pass arm — it remains useful as a
fp32-backward timing/error probe; re-adding the exact= plumbing locally is
required to reproduce the dead arm.
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cuda_flash_attention_tpu.kernels.attention import (
    fa2_backward,
    flash_attention_with_lse,
)
from cuda_flash_attention_tpu.ops.reference import reference_attention_grads
from cuda_flash_attention_tpu.utils.profiling import profile_ops
import re

_skip = re.compile(r"%?(copy|bitcast|tuple|fusion\.\d+ = \(\))")


def device_ms(ops):
    return sum(op.mean_ms for op in ops if not _skip.match(op.name))


def run():
    mode = os.environ.get("CFA_BWD_EXACT", "1")
    # --- error check at Medium-1 (B2 H8 S512 D64) ---
    b, h, s, d = 2, 8, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v, do = (jax.random.normal(kk, (b, h, s, d), jnp.float32)
                   for kk in ks)
    o, lse = flash_attention_with_lse(q, k, v, force_kernel=True)
    dq, dk, dv = fa2_backward(q, k, v, o, lse, do)
    rq, rk, rv = reference_attention_grads(q, k, v, do)
    err = max(
        float(jnp.abs(dq - rq).max()),
        float(jnp.abs(dk - rk).max()),
        float(jnp.abs(dv - rv).max()),
    )

    # --- device time at Stress-1 (B8 H16 S2048 D64) ---
    b, h, s, d = 8, 16, 2048, 64
    ks = jax.random.split(jax.random.PRNGKey(42), 3)
    q, k, v = (jax.random.uniform(kk, (b, h, s, d), jnp.float32) for kk in ks)
    o, lse = flash_attention_with_lse(q, k, v, force_kernel=True)
    do = jnp.ones_like(o)
    bwd = lambda q, k, v, o, lse, do: fa2_backward(q, k, v, o, lse, do)  # noqa: E731
    t = device_ms(profile_ops(bwd, q, k, v, o, lse, do, iters=4))
    print(f"exact={mode}: bwd_ms={t:.3f} max_grad_err={err:.3e}", flush=True)


if __name__ == "__main__":
    run()
