#!/usr/bin/env python3
"""Headline benchmark — the full published set, one JSON line.

Primary metric: PRODUCTION-path attention throughput — FA2 fwd+bwd TFLOPS/chip
at Stress-1 (B8 H16 S2048 D64) with bf16 tiles (the reference's fp16-SHM
analog, BASELINE.md:69-72).  `extra` carries the rest of the published set:
fp32-parity fwd+bwd TFLOPS (round-1 continuity metric), MFU accounting
(absolute and D=64-derated), int8/fp8 paged-KV decode tokens/sec/chip, and
train tokens/sec/chip.

Timing convention: per-kernel DEVICE time from jax.profiler traces — the
analog of the reference's cudaEvent-bracketed kernel timing
(/root/reference/include/timer.h:31-76); jit-boundary layout copies of the
benchmark fixtures are excluded exactly as cudaMemcpy is excluded there.
Backward counts every on-device op of the backward program (the D_i
reduction included, matching the reference's two bracketed kernels,
src/main.cpp:107).

FLOP convention: fwd = 4*B*H*S^2*D, bwd = 2.5x fwd (reference
test_flash_attention2.py:587,634); combined reference baseline = Stress-1
fwd 11.62 ms + bwd 64.61 ms => ~6.31 TFLOPS on an RTX 5090.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def _attention_point(tile_label, dtype, tile_dtype, shape=(8, 16, 2048, 64),
                     block_sizes=None):
    from cuda_flash_attention_tpu.kernels.attention import (
        fa2_backward,
        flash_attention,
        flash_attention_with_lse,
    )
    from cuda_flash_attention_tpu.ops.metrics import attention_flops
    from cuda_flash_attention_tpu.utils.profiling import profile_ops

    b, h, s, d = shape
    ks = jax.random.split(jax.random.PRNGKey(42), 3)
    q, k, v = (jax.random.uniform(kk, (b, h, s, d), dtype) for kk in ks)

    fwd = lambda q, k, v: flash_attention(  # noqa: E731
        q, k, v, tile_dtype=tile_dtype, force_kernel=True,
        block_sizes=block_sizes,
    )
    o, lse = flash_attention_with_lse(
        q, k, v, tile_dtype=tile_dtype, force_kernel=True,
        block_sizes=block_sizes,
    )
    do = jnp.ones_like(o)
    bwd = lambda q, k, v, o, lse, do: fa2_backward(  # noqa: E731
        q, k, v, o, lse, do, tile_dtype=tile_dtype, block_sizes=block_sizes
    )

    import re

    # Same exclusion set as profiling.kernel_device_time (the '%' prefix is
    # optional in some profiler versions): jit-boundary layout copies are
    # excluded like cudaMemcpy in the reference's bracketed timing.
    _skip = re.compile(r"%?(copy|bitcast|tuple|fusion\.\d+ = \(\))")

    def device_ms(ops):
        return sum(op.mean_ms for op in ops if not _skip.match(op.name))

    t_fwd = device_ms(profile_ops(fwd, q, k, v, iters=4)) / 1e3
    t_bwd = device_ms(profile_ops(bwd, q, k, v, o, lse, do, iters=4)) / 1e3
    if t_fwd == 0 or t_bwd == 0:
        raise RuntimeError(
            "no TPU ops in the profiler trace (is this running on a chip?)"
        )

    f_fwd = attention_flops(b, h, s, s, d, mode="forward")
    f_total = attention_flops(b, h, s, s, d, mode="both")  # 3.5x fwd
    return {
        "label": tile_label,
        "fwd_ms": round(t_fwd * 1e3, 3),
        "bwd_ms": round(t_bwd * 1e3, 3),
        "fwd_tflops": round(f_fwd / t_fwd / 1e12, 2),
        "fwd_bwd_tflops": round(f_total / (t_fwd + t_bwd) / 1e12, 2),
        "t_total_s": t_fwd + t_bwd,
        "flops_total": f_total,
    }


def _probe_device(timeout_s: int = 240) -> str | None:
    """Run a tiny matmul in a SUBPROCESS under a hard timeout: the axon
    tunnel occasionally wedges with device init OK but compute hanging
    inside C (uninterruptible by signals), which would stall the whole
    driver run.  Returns None when healthy, else an error string."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((256, 256), jnp.bfloat16);"
        "jax.block_until_ready(x @ x);"
        "print('probe-ok', jax.default_backend())"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return f"device probe timed out after {timeout_s}s (wedged tunnel?)"
    if r.returncode != 0 or "probe-ok" not in r.stdout:
        return f"device probe failed: {(r.stderr or r.stdout)[-200:]}"
    return None


def main():
    from cuda_flash_attention_tpu.utils.profiling import chip_peaks

    err = _probe_device()
    if err is not None:
        # Honest failure line instead of hanging the driver: value 0 with
        # the reason; the last MEASURED numbers live in BASELINE.md.
        print(json.dumps({
            "metric": "fa2_fwd_bwd_tflops_s2048_d64_bf16tile",
            "value": 0.0,
            "unit": "TFLOPS/chip",
            "vs_baseline": 0.0,
            "extra": {
                "error": err,
                "note": "device unreachable at bench time; last measured "
                        "86.05 TFLOPS (13.6x baseline) — see BASELINE.md",
            },
        }))
        return

    results = {}

    bf16 = _attention_point("bf16_tile", jnp.bfloat16, None)
    fp32 = _attention_point("fp32", jnp.float32, None)

    peaks = chip_peaks()
    # D=64 fills half of the MXU's 128-wide contraction/output lanes, so the
    # attainable peak for this shape is half the chip's bf16 peak.
    derate = 0.5
    mfu_abs = bf16["fwd_bwd_tflops"] / peaks.bf16_tflops
    mfu_derated = mfu_abs / derate

    # Reference combined baseline (BASELINE.md Stress-1, same convention).
    ref_t = 11.62e-3 + 64.61e-3
    ref_tflops = bf16["flops_total"] / ref_t / 1e12

    extra = {
        "chip": peaks.name,
        "bf16_fwd_ms": bf16["fwd_ms"],
        "bf16_bwd_ms": bf16["bwd_ms"],
        "bf16_fwd_tflops": bf16["fwd_tflops"],
        "mfu": round(mfu_abs, 3),
        "mfu_d64_derated": round(mfu_derated, 3),
        "fp32_fwd_bwd_tflops": fp32["fwd_bwd_tflops"],
        "fp32_fwd_ms": fp32["fwd_ms"],
        "fp32_bwd_ms": fp32["bwd_ms"],
        "fp32_vs_baseline": round(fp32["fwd_bwd_tflops"] / ref_tflops, 2),
    }

    # D=128 point (no MXU derate): same total FLOPs as the headline shape;
    # block optima from the round-4 sweep (logs/d128_roofline.log).  The
    # backward runs at ~90% of the chip's ABSOLUTE bf16 peak here —
    # on-chip confirmation that the D=64 headline's 2x derate is the MXU
    # shape, not kernel scheduling (docs/ROOFLINE.md).
    try:
        from cuda_flash_attention_tpu.kernels.common import BlockSizes

        d128 = _attention_point(
            "bf16_tile_d128", jnp.bfloat16, None, shape=(4, 8, 2048, 128),
            block_sizes=BlockSizes(
                block_q=2048, block_k=2048, block_q_dkv=256,
                block_k_dkv=2048, block_q_dq=256, block_k_dq=2048,
            ),
        )
        extra["d128_fwd_bwd_tflops"] = d128["fwd_bwd_tflops"]
        extra["d128_fwd_ms"] = d128["fwd_ms"]
        extra["d128_bwd_ms"] = d128["bwd_ms"]
        extra["d128_mfu_absolute"] = round(
            d128["fwd_bwd_tflops"] / peaks.bf16_tflops, 3
        )
    except Exception as e:  # noqa: BLE001
        extra["d128_error"] = f"{type(e).__name__}: {e}"[:200]

    # Decode + train throughput (flagship serving/training configs).  These
    # compile a full model — tolerate failure without losing the kernel
    # headline (e.g. if run off-TPU).
    try:
        from cuda_flash_attention_tpu.bench.decode_bench import (
            measure_decode_throughput,
        )
        from cuda_flash_attention_tpu.models.transformer import TransformerConfig

        flagship = TransformerConfig(
            vocab_size=2048, d_model=512, n_layers=4, n_heads=8, n_kv_heads=4,
            head_dim=64, d_ff=1536,
        )
        for label, cache_dtype in (
            ("int8", jnp.int8),
            ("fp8_e4m3", jnp.float8_e4m3fn),
        ):
            # Tunneled-backend jitter spans ~15% across identical runs:
            # the published number is the MEDIAN of 5 independent slope
            # measurements with the spread alongside (round-4 verdict
            # item 1 — best-of-2 could not distinguish recovery from a
            # lucky draw).
            dec = measure_decode_throughput(
                flagship, batch=16, prompt_len=128, gen_tokens=32,
                cache_dtype=cache_dtype, repeats=5,
            )
            extra[f"decode_{label}_tokens_per_sec"] = round(
                dec["tokens_per_sec_per_chip"]
            )
            extra[f"decode_{label}_step_ms"] = round(dec["step_ms"], 3)
            extra[f"decode_{label}_step_ms_spread"] = [
                dec["step_ms_min"], dec["step_ms_max"]
            ]
    except Exception as e:  # noqa: BLE001
        extra["decode_error"] = f"{type(e).__name__}: {e}"[:200]

    try:
        from cuda_flash_attention_tpu.bench.train_bench import (
            measure_train_throughput,
        )
        from cuda_flash_attention_tpu.models.transformer import TransformerConfig

        tcfg = TransformerConfig(
            vocab_size=2048, d_model=512, n_layers=4, n_heads=8, n_kv_heads=4,
            head_dim=64, d_ff=1536,
        )
        tr = measure_train_throughput(tcfg, batch=4, seq=2048, iters=4)
        extra["train_tokens_per_sec"] = round(tr["train_tokens_per_sec_per_chip"])
    except Exception as e:  # noqa: BLE001
        extra["train_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps({
        "metric": "fa2_fwd_bwd_tflops_s2048_d64_bf16tile",
        "value": bf16["fwd_bwd_tflops"],
        "unit": "TFLOPS/chip",
        "vs_baseline": round(bf16["fwd_bwd_tflops"] / ref_tflops, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
