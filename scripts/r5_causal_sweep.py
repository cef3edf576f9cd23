"""Round-5: causal-attention block sweep at the TRAIN shape.

The base-model train profile (evidence/r5/train_profile_base.log) shows the
causal kernels at ~48-51% of the derated ceiling (fwd 0.876 ms, fused bwd
1.72 ms per layer at B4 H16 S2048 D64) while the non-causal headline runs
at 90% — the defaults in BlockSizes.default(causal=True) were last swept in
round 2.  Sweep fwd (block_q x block_k) and backward (fused vs two-kernel,
dkv blocks) under causal=True at the train shape, GQA like the base model
(16 q heads / 8 kv heads).

Usage (on the chip):  python scripts/r5_causal_sweep.py
"""

import json
import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from cuda_flash_attention_tpu.kernels.attention import (
    fa2_backward,
    flash_attention,
    flash_attention_with_lse,
)
from cuda_flash_attention_tpu.kernels.common import BlockSizes
from cuda_flash_attention_tpu.ops.metrics import attention_flops
from cuda_flash_attention_tpu.utils.profiling import profile_ops

_skip = re.compile(r"%?(copy|bitcast|tuple|fusion\.\d+ = \(\))")
B, HQ, HKV, S, D = 4, 16, 8, 2048, 64


def device_ms(ops):
    return sum(op.mean_ms for op in ops if not _skip.match(op.name))


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.bfloat16)
    f_fwd = attention_flops(B, HQ, S, S, D, mode="forward", causal=True)
    f_bwd = attention_flops(B, HQ, S, S, D, mode="backward", causal=True)

    print("== forward (causal, GQA 16/8) ==", flush=True)
    for bq in (512, 1024, 2048):
        for bk in (256, 512, 1024, 2048):
            bs = BlockSizes(block_q=bq, block_k=bk)
            try:
                t = device_ms(profile_ops(
                    lambda q, k, v: flash_attention(
                        q, k, v, causal=True, force_kernel=True,
                        block_sizes=bs),
                    q, k, v, iters=4))
                print(json.dumps({"fwd": [bq, bk], "ms": round(t, 4),
                                  "tflops": round(f_fwd / t / 1e9, 1)}),
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"fwd": [bq, bk],
                                  "error": str(e)[:90]}), flush=True)

    o, lse = flash_attention_with_lse(q, k, v, causal=True, force_kernel=True)
    do = jnp.ones_like(o)
    print("== backward (causal) ==", flush=True)
    for bqd in (256, 512, 1024):
        for bkd in (512, 1024, 2048):
            bs = BlockSizes(block_q_dkv=bqd, block_k_dkv=bkd,
                            block_q_dq=bqd, block_k_dq=bkd)
            try:
                t = device_ms(profile_ops(
                    lambda q, k, v, o, lse, do: fa2_backward(
                        q, k, v, o, lse, do, causal=True, block_sizes=bs),
                    q, k, v, o, lse, do, iters=4))
                print(json.dumps({"bwd": [bqd, bkd], "ms": round(t, 4),
                                  "tflops": round(f_bwd / t / 1e9, 1)}),
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"bwd": [bqd, bkd],
                                  "error": str(e)[:90]}), flush=True)


if __name__ == "__main__":
    main()
