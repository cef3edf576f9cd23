#!/usr/bin/env python3
"""Headline benchmark: FA2 fwd+bwd attention TFLOPS/chip at S=2048, D=64.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md, reference RTX 5090 fp32 CUDA-cores, Stress-1 config
B8 H16 S2048 D64): fwd 11.62 ms + bwd 64.61 ms; with the reference FLOP
convention (fwd = 4*B*H*S^2*D, bwd = 2.5x fwd, test_flash_attention2.py:587,
634) that is a combined fwd+bwd throughput of ~6.31 TFLOPS.  This benchmark
runs the same config and convention on one TPU chip, fp32-parity kernels.
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    from cuda_flash_attention_tpu.kernels.attention import (
        fa2_backward,
        flash_attention,
        flash_attention_with_lse,
    )
    from cuda_flash_attention_tpu.ops.metrics import attention_flops
    from cuda_flash_attention_tpu.utils.timing import device_benchmark

    b, h, s, d = 8, 16, 2048, 64
    ks = jax.random.split(jax.random.PRNGKey(42), 3)
    q, k, v = (jax.random.uniform(kk, (b, h, s, d), jnp.float32) for kk in ks)

    fwd = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    # Backward measured from forward artifacts, kernels only — the reference
    # convention: its backward CLI/harness reloads (O, logsumexp) and times
    # the backward kernels alone (src/main.cpp:66-81,
    # test_flash_attention2.py:608-794).
    o, lse = flash_attention_with_lse(q, k, v)
    do = jnp.ones_like(o)
    bwd = jax.jit(
        lambda q, k, v, o, lse, do: fa2_backward(q, k, v, o, lse, do)
    )

    t_fwd = device_benchmark(fwd, q, k, v, warmup=1, iters=4)
    t_bwd = device_benchmark(bwd, q, k, v, o, lse, do, warmup=1, iters=4)

    flops_total = attention_flops(b, h, s, s, d, mode="both")  # 3.5x fwd
    tflops = flops_total / (t_fwd + t_bwd) / 1e12

    # Reference combined (BASELINE.md Stress-1): same convention.
    ref_t = 11.62e-3 + 64.61e-3
    ref_tflops = flops_total / ref_t / 1e12

    print(json.dumps({
        "metric": "fa2_fwd_bwd_tflops_s2048_d64_fp32",
        "value": round(tflops, 3),
        "unit": "TFLOPS/chip",
        "vs_baseline": round(tflops / ref_tflops, 3),
    }))


if __name__ == "__main__":
    main()
