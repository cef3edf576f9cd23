"""Block-size autotuner for the FA2 kernel family.

The reference documents its tile-constant rationale in a comment block
(/root/reference/kernels/kernel_fa2_optimized.cu:388-399: BM=BN=32, TM=TN=4
chosen for SHM/register pressure on CUDA arch 61).  On TPU the analogous
constants are `BlockSizes` (kernels/common.py): sequence-tile shapes that
trade VMEM footprint, online-softmax rescale count, and grid overhead.  This
tool regenerates that table from measurement instead of hand-sweeping:

    python -m cuda_flash_attention_tpu.bench.autotune \
        --seq 2048 --tile bf16 --kernels fwd,fused --causal both

Each candidate (block_q, block_k) is timed with per-XLA-op DEVICE time from
the profiler (utils/profiling.kernel_device_time — the cudaEvent analog), so
tunnel dispatch latency never enters.  Combinations whose VMEM footprint the
Mosaic compiler rejects are recorded as failures and skipped.

Output: one JSON line per measurement plus a winners table; `--json PATH`
appends machine-readable rows for the committed sweep artifact
(plots/autotune_*.json).
"""

from __future__ import annotations

import argparse
import itertools
import json

import jax
import jax.numpy as jnp

from cuda_flash_attention_tpu.kernels.attention import _replicate_lanes
from cuda_flash_attention_tpu.kernels.fa2_backward import (
    fa2_backward_dkv_aligned,
    fa2_backward_dq_aligned,
    fa2_backward_fused_aligned,
)
from cuda_flash_attention_tpu.kernels.fa2_forward import fa2_forward_aligned
from cuda_flash_attention_tpu.ops.metrics import attention_flops
from cuda_flash_attention_tpu.utils.profiling import kernel_device_time

_TILE = {"fp32": None, "bf16": jnp.bfloat16, "fp16": jnp.float16}


def _mk_inputs(b, h, s, d, tile):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    io_dtype = jnp.float32 if tile is None else jnp.bfloat16
    q = jax.random.normal(ks[0], (b, h, s, d), io_dtype)
    k = jax.random.normal(ks[1], (b, h, s, d), io_dtype)
    v = jax.random.normal(ks[2], (b, h, s, d), io_dtype)
    do = jax.random.normal(ks[3], (b, h, s, d), io_dtype)
    return q, k, v, do


def _bwd_stats(q, k, v, do, causal, sm, tile):
    o, lse = fa2_forward_aligned(
        q, k, v, causal=causal, sm_scale=sm, block_q=min(1024, q.shape[2]),
        block_k=min(1024, k.shape[2]), kv_len=k.shape[2], tile_dtype=tile,
    )
    di = _replicate_lanes(
        jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    )
    return o, lse, di


def _candidates(s, blocks):
    for bq, bk in itertools.product(blocks, blocks):
        if s % bq == 0 and s % bk == 0:
            yield bq, bk


def sweep(
    kernel: str,          # fwd | fused | dq | dkv
    *,
    b: int = 8,
    h: int = 16,
    s: int = 2048,
    d: int = 64,
    tile=None,
    causal: bool = False,
    blocks=(256, 512, 1024, 2048, 4096),
    iters: int = 4,
) -> list[dict]:
    """Time every feasible (block_q, block_k) for one kernel; returns rows
    sorted fastest-first."""
    sm = 1.0 / d ** 0.5
    q, k, v, do = _mk_inputs(b, h, s, d, tile)
    if kernel != "fwd":
        o, lse, di = _bwd_stats(q, k, v, do, causal, sm, tile)
    mode = "forward" if kernel == "fwd" else "backward"
    flops = attention_flops(b, h, s, s, d, mode=mode)
    if causal:
        flops //= 2
    rows = []
    for bq, bk in _candidates(s, blocks):
        common = dict(causal=causal, sm_scale=sm, block_q=bq, block_k=bk,
                      kv_len=s, tile_dtype=tile)
        try:
            if kernel == "fwd":
                t = kernel_device_time(
                    lambda q, k, v: fa2_forward_aligned(q, k, v, **common),
                    q, k, v, iters=iters)
            elif kernel == "fused":
                t = kernel_device_time(
                    lambda *a: fa2_backward_fused_aligned(*a, **common),
                    q, k, v, do, lse, di, iters=iters)
            elif kernel == "dq":
                t = kernel_device_time(
                    lambda *a: fa2_backward_dq_aligned(*a, **common),
                    q, k, v, do, lse, di, iters=iters)
            elif kernel == "dkv":
                t = kernel_device_time(
                    lambda *a: fa2_backward_dkv_aligned(*a, **common),
                    q, k, v, do, lse, di, iters=iters)
            else:
                raise ValueError(f"unknown kernel {kernel!r}")
            row = {
                "kernel": kernel, "tile": "fp32" if tile is None else str(tile),
                "causal": causal, "B": b, "H": h, "S": s, "D": d,
                "block_q": bq, "block_k": bk,
                "ms": t * 1e3, "tflops": flops / t / 1e12,
            }
        except Exception as e:  # Mosaic VMEM rejection etc.
            row = {
                "kernel": kernel, "tile": "fp32" if tile is None else str(tile),
                "causal": causal, "B": b, "H": h, "S": s, "D": d,
                "block_q": bq, "block_k": bk,
                "ms": float("inf"), "error": f"{type(e).__name__}",
            }
        rows.append(row)
        print(json.dumps(row), flush=True)
    rows.sort(key=lambda r: r["ms"])
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kernels", default="fwd,fused",
                   help="comma list of fwd,fused,dq,dkv")
    p.add_argument("--seq", default="2048", help="comma list of S values")
    p.add_argument("--tile", default="bf16", help="comma list of fp32,bf16,fp16")
    p.add_argument("--causal", default="both", choices=["true", "false", "both"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--head-dim", type=int, default=64)
    p.add_argument("--blocks", default="256,512,1024,2048,4096")
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--json", default=None, help="append rows to this file")
    args = p.parse_args()

    causals = {"true": [True], "false": [False], "both": [False, True]}[args.causal]
    blocks = tuple(int(x) for x in args.blocks.split(","))
    all_rows = []
    winners = []
    for s in (int(x) for x in args.seq.split(",")):
        # Keep the score footprint roughly constant across S so big sweeps
        # fit: shrink batch as S grows past the reference Stress-1 shape.
        b = max(1, args.batch * 2048 * 2048 // (s * s)) if s > 2048 else args.batch
        for tile_name in args.tile.split(","):
            tile = _TILE[tile_name]
            for causal in causals:
                for kern in args.kernels.split(","):
                    rows = sweep(
                        kern, b=b, h=args.heads, s=s, d=args.head_dim,
                        tile=tile, causal=causal, blocks=blocks,
                        iters=args.iters,
                    )
                    all_rows.extend(rows)
                    best = rows[0]
                    winners.append(best)
                    print(
                        f"## BEST {kern} S={s} tile={tile_name} "
                        f"causal={causal}: bq={best['block_q']} "
                        f"bk={best['block_k']} {best['ms']:.3f} ms "
                        f"({best.get('tflops', 0):.1f} TF)",
                        flush=True,
                    )
    if args.json:
        with open(args.json, "a") as f:
            for r in all_rows:
                f.write(json.dumps(r) + "\n")
    print("\n=== winners ===")
    for w in winners:
        print(json.dumps(w))


if __name__ == "__main__":
    main()
