"""On-chip A/B for the compact window grid (round 4): S=16k, W=4k,
B1 H8 D64 bf16 — the round-3/4 campaign shape.  Sweeps window block sizes
(the 512 snap in BlockSizes.default(window) was chosen to limit DEAD-grid-
iteration cost, which the compact grid eliminates — larger blocks may now
win) and prints the global-causal baseline for the speedup.

Live-FLOP accounting at this shape: causal-global computes ~S/2 cols/row
(8192); the window computes ~window + block/2 (4096 + b/2) — ideal
speedup ~1.8x at b=512.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp

from cuda_flash_attention_tpu import flash_attention
from cuda_flash_attention_tpu.kernels.common import BlockSizes
from cuda_flash_attention_tpu.utils.timing import device_benchmark

B, H, S, D, W = 1, 8, 16384, 64, 4096

ks = jax.random.split(jax.random.PRNGKey(0), 3)
q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16) for kk in ks)

rows = {}


def bench(label, window, blocks=None):
    fn = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, causal=True, window=window, tile_dtype=jnp.bfloat16,
        block_sizes=blocks, force_kernel=True))
    secs = device_benchmark(fn, q, k, v)
    rows[label] = round(secs * 1e3, 3)
    print(json.dumps({label: rows[label]}), flush=True)


bench("global_ms", None)
for b in (256, 512, 1024, 2048):
    blocks = BlockSizes(block_q=b, block_k=b, block_q_dkv=b, block_k_dkv=b,
                        block_q_dq=b, block_k_dq=b)
    bench(f"win{W}_b{b}_ms", W, blocks)

best_label = min((k for k in rows if k != "global_ms"), key=rows.get)
print(json.dumps({
    "window_prefill_ms": rows,
    "best": best_label,
    "speedup_best": round(rows["global_ms"] / rows[best_label], 2),
}))
