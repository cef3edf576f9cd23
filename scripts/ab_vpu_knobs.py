#!/usr/bin/env python3
"""A/B the softmax-chain VPU knobs on the real chip at Stress-1 bf16.

Run via scripts/ab_vpu_knobs.sh (each knob combo needs a fresh process:
the knobs are read at trace time and jit caches would go stale).

Prints one JSON line: {"chain": .., "fold": .., "fwd_ms": .., "bwd_ms": ..}
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from cuda_flash_attention_tpu.kernels.attention import (
    fa2_backward,
    flash_attention,
    flash_attention_with_lse,
)
from cuda_flash_attention_tpu.utils.profiling import kernel_device_time


def main():
    b, h, s, d = 8, 16, 2048, 64
    ks = jax.random.split(jax.random.PRNGKey(42), 3)
    q, k, v = (jax.random.uniform(kk, (b, h, s, d), jnp.bfloat16) for kk in ks)

    fwd = lambda q, k, v: flash_attention(q, k, v, force_kernel=True)  # noqa: E731
    o, lse = flash_attention_with_lse(q, k, v, force_kernel=True)
    do = jnp.ones_like(o)
    bwd = lambda *a: fa2_backward(*a)  # noqa: E731

    t_fwd = kernel_device_time(fwd, q, k, v, iters=4)
    t_bwd = kernel_device_time(bwd, q, k, v, o, lse, do, iters=4)
    print(json.dumps({
        "chain": os.environ.get("CFA_BF16_VPU_CHAIN", "1"),
        "fold": os.environ.get("CFA_BWD_STAT_FOLD", "1"),
        "static_max": os.environ.get("CFA_STATIC_MAX", "0"),
        "fwd_ms": round(t_fwd * 1e3, 3),
        "bwd_ms": round(t_bwd * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
