"""Round-5: D=256 performance point (VERDICT r4 item 8 — correctness was
tested in round 4 but no bench number existed while SUPPORTED_HEAD_DIMS
advertises 256).  Same total FLOPs as the D=64 headline (B*H scaled down),
bf16 inputs, small block sweep because the D=128 analysis predicts the
exposed-rowsum penalty grows with D.

Usage (on the chip):  python scripts/r5_d256_point.py
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
B, H, S, D = 2, 8, 2048, 256


def device_ms(ops):
    return sum(op.mean_ms for op in ops if not _skip.match(op.name))


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16) for kk in ks)
    f_fwd = attention_flops(B, H, S, S, D, mode="forward")
    f_tot = attention_flops(B, H, S, S, D, mode="both")

    best = None
    for bq, bk in ((2048, 2048), (1024, 2048), (1024, 1024), (512, 2048)):
        for bqd, bkd in ((256, 2048), (512, 2048), (512, 1024)):
            bs = BlockSizes(block_q=bq, block_k=bk, block_q_dkv=bqd,
                            block_k_dkv=bkd, block_q_dq=bqd, block_k_dq=bkd)
            try:
                fwd = lambda q, k, v: flash_attention(  # noqa: E731
                    q, k, v, force_kernel=True, block_sizes=bs)
                o, lse = flash_attention_with_lse(
                    q, k, v, force_kernel=True, block_sizes=bs)
                do = jnp.ones_like(o)
                bwd = lambda q, k, v, o, lse, do: fa2_backward(  # noqa: E731
                    q, k, v, o, lse, do, block_sizes=bs)
                t_f = device_ms(profile_ops(fwd, q, k, v, iters=4))
                t_b = device_ms(profile_ops(bwd, q, k, v, o, lse, do, iters=4))
                row = {
                    "blocks": [bq, bk, bqd, bkd],
                    "fwd_ms": round(t_f, 3), "bwd_ms": round(t_b, 3),
                    "fwd_tflops": round(f_fwd / t_f / 1e9, 1),
                    "fwd_bwd_tflops": round(f_tot / (t_f + t_b) / 1e9, 1),
                }
                print(json.dumps(row), flush=True)
                if best is None or row["fwd_bwd_tflops"] > best["fwd_bwd_tflops"]:
                    best = row
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"blocks": [bq, bk, bqd, bkd],
                                  "error": str(e)[:120]}), flush=True)
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
