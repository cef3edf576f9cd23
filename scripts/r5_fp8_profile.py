"""Round-5: root-cause the fp8-e4m3 paged-KV decode cost anomaly.

Round-4 measured fp8 KV decode at 0.306-0.316 ms/step vs int8's 0.181-0.191
at IDENTICAL bytes/token (both 1-byte paged caches + per-token fp32 scales
through the same kernel) — if decode is KV-bandwidth-bound (int8 beats bf16
1.3x), fp8 should be within ~10% of int8.  This script profiles per-op
device time for both cache dtypes on (a) the full flagship decode step and
(b) the paged attention kernel in isolation, to localize the 65% tax.

Usage (on the chip):  python scripts/r5_fp8_profile.py [--isolate]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cuda_flash_attention_tpu.bench.decode_bench import (
    build_state,
    make_loop_fn,
    measure_decode_throughput,
)
from cuda_flash_attention_tpu.models.transformer import TransformerConfig
from cuda_flash_attention_tpu.utils.profiling import profile_ops

FLAGSHIP = TransformerConfig(
    vocab_size=2048, d_model=512, n_layers=4, n_kv_heads=4,
    n_heads=8, head_dim=64, d_ff=1536,
)


def profile_full(cache_dtype, label, steps=16):
    cfg = FLAGSHIP
    batch, prompt_len = 16, 128
    max_len = 128 + 64 * 6 + 128
    params, caches, page_table, first = build_state(
        cfg, batch, prompt_len, max_len, 128, cache_dtype
    )
    run_n = make_loop_fn(cfg, page_table, prompt_len)

    # Non-donating wrapper for repeat profiling (donation would consume the
    # caches on the first call).
    def stepper(params, caches, tokens):
        c2 = jax.tree.map(lambda x: x + 0 if x.dtype != jnp.bool_ else x, caches)
        return run_n(params, c2, tokens, n=steps)

    ops = profile_ops(stepper, params, caches, first, iters=2)
    print(f"\n=== {label}: top ops over {steps}-step loop (mean ms/call) ===")
    total = 0.0
    for op in ops[:18]:
        print(f"  {op.mean_ms:9.4f} ms  x{op.count:<3d}  {op.name[:110]}")
        total += op.mean_ms
    print(f"  (sum of shown: {total:.4f} ms; per step ~{total/steps*1e3:.1f} us)")


def profile_kernel(cache_dtype, label):
    """Isolated paged_decode_attention at the flagship decode shape."""
    from cuda_flash_attention_tpu.decode.attention import paged_decode_attention
    from cuda_flash_attention_tpu.decode.kv_cache import init_kv_pages

    num_seqs, hq, hkv, d, page, pps = 16, 8, 4, 64, 128, 6
    pages = init_kv_pages(hkv, num_seqs * pps + 1, page, d, cache_dtype)
    # Fill with real-ish values so DMA is honest.
    key = jax.random.PRNGKey(0)
    kp = jax.random.normal(key, pages.k_pages.shape, jnp.float32)
    if jnp.dtype(cache_dtype) == jnp.dtype(jnp.int8):
        kp = jnp.clip(jnp.round(kp * 30), -127, 127)
    pages = type(pages)(
        k_pages=kp.astype(pages.k_pages.dtype),
        k_scales=pages.k_scales,
        v_pages=kp.astype(pages.v_pages.dtype),
        v_scales=pages.v_scales,
    )
    q = jax.random.normal(key, (num_seqs, hq, d), jnp.bfloat16)
    table = jnp.arange(1, num_seqs * pps + 1, dtype=jnp.int32).reshape(
        num_seqs, pps
    )
    lengths = jnp.full((num_seqs,), pps * page, jnp.int32)

    def many(q, pages, table, lengths):
        out = q
        for _ in range(32):
            out = paged_decode_attention(
                out.astype(q.dtype) * 1e-30 + q, pages, table, lengths
            )
        return out

    ops = profile_ops(many, q, pages, table, lengths, iters=2)
    print(f"\n=== {label}: isolated kernel x32 (mean ms/call) ===")
    for op in ops[:8]:
        print(f"  {op.mean_ms:9.4f} ms  x{op.count:<3d}  {op.name[:110]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--isolate", action="store_true")
    p.add_argument("--quick", action="store_true",
                   help="just the median-of-5 step times")
    args = p.parse_args()
    print("backend:", jax.default_backend(), jax.devices())
    if args.quick:
        for label, dt in (("int8", jnp.int8), ("fp8", jnp.float8_e4m3fn)):
            r = measure_decode_throughput(FLAGSHIP, cache_dtype=dt)
            print(label, {k: r[k] for k in
                          ("step_ms", "step_ms_min", "step_ms_max",
                           "tokens_per_sec_per_chip")})
        return
    if args.isolate:
        profile_kernel(jnp.int8, "int8")
        profile_kernel(jnp.float8_e4m3fn, "fp8_e4m3")
    else:
        profile_full(jnp.int8, "int8")
        profile_full(jnp.float8_e4m3fn, "fp8_e4m3")


if __name__ == "__main__":
    main()
