"""Round-5: window + sinks compact-grid A/B (verdict item 9 criterion:
compact span covering sink blocks + window span shows >= 1.5x over global
causal at S=16k / W=4k with sinks=4; round 4's compact grid skipped every
sinks > 0 shape and fell back to the dense grid's 1.08x).

Usage (on the chip):  python scripts/r5_window_sinks_ab.py
"""

import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from cuda_flash_attention_tpu.kernels.attention import flash_attention
from cuda_flash_attention_tpu.kernels.common import BlockSizes
from cuda_flash_attention_tpu.utils.profiling import profile_ops

_skip = re.compile(r"%?(copy|bitcast|tuple|fusion\.\d+ = \(\))")
B, H, S, D, W = 1, 8, 16384, 64, 4096


def device_ms(fn, *args):
    ops = profile_ops(fn, *args, iters=4)
    return sum(op.mean_ms for op in ops if not _skip.match(op.name))


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16) for kk in ks)

    t_global = device_ms(
        lambda q, k, v: flash_attention(q, k, v, causal=True,
                                        force_kernel=True), q, k, v)
    print(f"global causal:          {t_global:7.3f} ms")

    for sinks in (0, 4, 256):
        t = device_ms(
            lambda q, k, v: flash_attention(
                q, k, v, causal=True, window=W, sinks=sinks,
                force_kernel=True), q, k, v)
        print(f"win{W} sinks={sinks:<4d} compact: {t:7.3f} ms  "
              f"= {t_global/t:4.2f}x over global")

    # The b=1024 window default via BlockSizes.default is what the wrapper
    # picks; also pin one explicit config for the record.
    bs = BlockSizes(block_q=1024, block_k=1024, block_q_dkv=1024,
                    block_k_dkv=1024, block_q_dq=1024, block_k_dq=1024)
    t = device_ms(
        lambda q, k, v: flash_attention(
            q, k, v, causal=True, window=W, sinks=4, block_sizes=bs,
            force_kernel=True), q, k, v)
    print(f"win{W} sinks=4 b1024 explicit: {t:7.3f} ms = "
          f"{t_global/t:4.2f}x over global")


if __name__ == "__main__":
    main()
