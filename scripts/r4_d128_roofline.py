"""D=128 roofline check: the ROOFLINE.md structural argument says the ~10%
residual at D=64 is the MXU half-derate + pipeline fill, and that "within
2% of roofline" is the right aspiration once D=128 fills the contraction
lanes.  This measures it: FA2 fwd and fwd+bwd at B4 H8 S2048 D128 (same
total FLOPs as the D=64 Stress-1 headline: 4*B*H*S^2*D is invariant under
B*H halved / D doubled), bf16 tiles, against the UNDERATED 197 TFLOPS v5e
ceiling.  Sweeps a small block grid since the committed defaults are the
D=64 optima (plots/autotune_r4.json).

Usage: python scripts/r4_d128_roofline.py [quick|sweep]
"""

import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cuda_flash_attention_tpu.kernels.attention import flash_attention
from cuda_flash_attention_tpu.kernels.common import BlockSizes
from cuda_flash_attention_tpu.utils.timing import device_benchmark

B, H, S, D = 4, 8, 2048, 128
PEAK_TFLOPS = 197.0  # v5e bf16 MXU peak, no D-derate at D=128
FWD_FLOPS = 4 * B * H * S * S * D
BWD_FLOPS = 2.5 * FWD_FLOPS  # reference convention


def make_inputs():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.float32) for kk in ks[:3])
    do = jax.random.normal(ks[3], (B, H, S, D), jnp.float32)
    return q, k, v, do


def measure(blocks: BlockSizes):
    q, k, v, do = make_inputs()

    def fwd(q, k, v):
        return flash_attention(
            q, k, v, tile_dtype=jnp.bfloat16, block_sizes=blocks,
            force_kernel=True,
        )

    def fwd_bwd(q, k, v, do):
        o, vjp = jax.vjp(lambda q, k, v: fwd(q, k, v), q, k, v)
        return o, vjp(do)

    fwd_s = device_benchmark(jax.jit(fwd), q, k, v)
    tot_s = device_benchmark(jax.jit(fwd_bwd), q, k, v, do)
    bwd_s = max(tot_s - fwd_s, 1e-9)
    return {
        "fwd_ms": round(fwd_s * 1e3, 3),
        "bwd_ms": round(bwd_s * 1e3, 3),
        "fwd_tflops": round(FWD_FLOPS / fwd_s / 1e12, 2),
        "fwd_bwd_tflops": round((FWD_FLOPS + BWD_FLOPS) / tot_s / 1e12, 2),
        "pct_of_peak_fwd_bwd": round(
            (FWD_FLOPS + BWD_FLOPS) / tot_s / 1e12 / PEAK_TFLOPS * 100, 1
        ),
    }


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    if mode == "quick":
        combos = [BlockSizes.default()]
    else:
        combos = []
        for bq, bk, bq_dkv in itertools.product(
            (1024, 2048), (1024, 2048), (256, 512, 1024)
        ):
            combos.append(BlockSizes(
                block_q=bq, block_k=bk,
                block_q_dkv=bq_dkv, block_k_dkv=bk,
                block_q_dq=bq_dkv, block_k_dq=bk,
            ))
    best = None
    for blocks in combos:
        label = (f"q{blocks.block_q}k{blocks.block_k}"
                 f"_dkv{blocks.block_q_dkv}x{blocks.block_k_dkv}")
        try:
            r = measure(blocks)
        except Exception as e:  # VMEM overflow at big D=128 tiles, etc.
            print(json.dumps({"blocks": label,
                              "error": str(e).splitlines()[0][:120]}))
            continue
        row = {"blocks": label, **r}
        print(json.dumps(row), flush=True)
        if best is None or r["fwd_bwd_tflops"] > best["fwd_bwd_tflops"]:
            best = row
    print(json.dumps({
        "d128_roofline": best, "shape": f"B{B}_H{H}_S{S}_D{D}",
        "peak_tflops": PEAK_TFLOPS,
    }))


if __name__ == "__main__":
    main()
