"""Decode throughput benchmark: steady-state tokens/sec/chip over the paged
quantized KV cache (BASELINE.md "TPU targets": decode tokens/sec/chip with
paged INT8 KV).

Measures the DEVICE steady state: `decode_step` + greedy sampling chained in
a `lax.fori_loop` (each step consumes the previous step's sampled token, so
nothing can be hoisted), timed at two loop lengths and differenced — the
same slope method utils/timing.py uses to cancel the fixed dispatch latency
of tunneled PJRT backends.  Host-scheduler overhead (admission, page
allocation) is excluded by design: it overlaps device work in a real serving
loop and is measured separately by the engine tests.

Usage:
    python -m cuda_flash_attention_tpu.bench.decode_bench \
        --batch 16 --prompt-len 128 --gen 64
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from cuda_flash_attention_tpu.decode.kv_cache import (
    PageAllocator,
    init_kv_pages,
    init_kv_pages_stacked,
    write_prompt_kv,
    write_prompt_kv_stacked,
)
from cuda_flash_attention_tpu.decode.model import decode_step, prefill_forward
from cuda_flash_attention_tpu.models.transformer import (
    TransformerConfig,
    init_params,
    stack_layer_params,
)
from cuda_flash_attention_tpu.utils.timing import sync


def _cdiv(a, b):
    return -(-a // b)


def build_state(cfg: TransformerConfig, batch: int, prompt_len: int,
                max_len: int, page_size: int = 128, cache_dtype=jnp.int8,
                seed: int = 0, weight_dtype=None, act_quant: bool = False,
                scan_layers: bool = False):
    """Prefill `batch` random prompts into a paged cache sized for max_len.

    Uses the per-layer LIST layout (unrolled layer loop) by default — the
    production decode path.  On-chip measurement (round 4, v5e) shows the
    stacked lax.scan form is 2.4-2.9x slower per step (scan's per-layer
    dynamic-slice of stacked weights + KV pages and the ys re-stack cost
    two extra HBM passes); pass ``scan_layers=True`` to benchmark it.

    ``weight_dtype`` (int8/fp8) quantizes the dense projections; in the
    scanned form QuantizedTensor is a pytree, so stack_layer_params stacks
    its values/scales leaf-wise and lax.scan slices a 2D int8 weight + 1D
    scale per layer.  ``act_quant=True`` marks int8 weights for the W8A8
    native-MXU matmul path (quant/linear.py)."""
    params = init_params(jax.random.PRNGKey(seed), cfg)
    if weight_dtype is not None:
        from cuda_flash_attention_tpu.quant.linear import (
            quantize_transformer_params,
        )

        params = quantize_transformer_params(
            params, weight_dtype, act_quant=act_quant
        )
    if scan_layers:
        params = {**params, "layers": stack_layer_params(params["layers"])}
    pages_per_seq = _cdiv(max_len, page_size)
    num_pages = batch * pages_per_seq + 1
    alloc = PageAllocator(num_pages)
    page_table = np.zeros((batch, pages_per_seq), np.int32)

    if scan_layers:
        caches = init_kv_pages_stacked(
            cfg.n_layers, cfg.n_kv_heads, num_pages, page_size, cfg.head_dim,
            cache_dtype,
        )
    else:
        caches = [
            init_kv_pages(cfg.n_kv_heads, num_pages, page_size, cfg.head_dim,
                          cache_dtype)
            for _ in range(cfg.n_layers)
        ]
    tokens = jax.random.randint(
        jax.random.PRNGKey(seed + 1), (batch, prompt_len), 0, cfg.vocab_size
    )
    logits, kv = jax.jit(
        lambda p, t: prefill_forward(p, t, cfg, last_only=True)
    )(params, tokens)

    n_prompt_pages = _cdiv(prompt_len, page_size)
    kv_len = n_prompt_pages * page_size
    pad = kv_len - prompt_len
    for s in range(batch):
        ids = alloc.alloc(pages_per_seq)  # preallocate the whole horizon
        page_table[s, :] = ids
        ids_prompt = jnp.asarray(ids[:n_prompt_pages], jnp.int32)
        if scan_layers:
            k_all, v_all = kv
            ks = jnp.pad(k_all[:, s], ((0, 0), (0, pad), (0, 0), (0, 0)))
            vs = jnp.pad(v_all[:, s], ((0, 0), (0, pad), (0, 0), (0, 0)))
            caches = write_prompt_kv_stacked(caches, ks, vs, ids_prompt)
        else:
            for li, (k_all, v_all) in enumerate(kv):
                ks = jnp.pad(k_all[s], ((0, pad), (0, 0), (0, 0)))
                vs = jnp.pad(v_all[s], ((0, pad), (0, 0), (0, 0)))
                caches[li] = write_prompt_kv(caches[li], ks, vs, ids_prompt)

    first = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    return params, caches, jnp.asarray(page_table), first


def make_loop_fn(cfg: TransformerConfig, page_table, start_len: int,
                 horizon: int | None = None, page_size: int = 128):
    """Returns fn(params, caches, tokens, n) running n chained greedy decode
    steps on-device; output feeds the next step's input.

    ``horizon`` (max tokens this loop will ever hold) SLICES the page table
    to the live span: the paged kernel's grid covers pages_per_seq columns
    and each dead (beyond-length) page cell still costs ~0.9 us of grid
    bookkeeping (measured round 5: the same decode step at 11 preallocated
    pages/seq ran 0.52 ms vs 0.18 at 5) — benchmarks preallocate a 6x
    generation slack, so without the slice they time the slack."""
    if horizon is not None:
        pages = page_table.shape[1]
        live = min(-(-int(horizon) // int(page_size)), pages)
        page_table = page_table[:, :live]
    active = jnp.ones((page_table.shape[0],), bool)

    @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(1,))
    def run_n(params, caches, tokens, n):
        def body(i, carry):
            caches, tokens = carry
            positions = jnp.full(tokens.shape, start_len, jnp.int32) + i
            logits, caches = decode_step(
                params, tokens, positions, caches, page_table, active, cfg
            )
            return caches, jnp.argmax(logits, axis=-1).astype(jnp.int32)

        caches, tokens = jax.lax.fori_loop(0, n, body, (caches, tokens))
        return caches, tokens

    return run_n


def measure_decode_throughput(
    cfg: TransformerConfig,
    batch: int = 16,
    prompt_len: int = 128,
    gen_tokens: int = 64,
    page_size: int = 128,
    cache_dtype=jnp.int8,
    weight_dtype=None,
    act_quant: bool = False,
    repeats: int = 5,
) -> dict:
    """MEDIAN-of-``repeats`` slope measurements (each slope = one lo/hi
    loop pair), with the full spread published alongside.  Round 4's
    best-of-2 protocol under ~15% tunnel jitter could not distinguish a
    recovered regression from a lucky draw (round-4 verdict); the median
    of >= 5 independent slopes plus the min/max spread makes
    round-over-round comparisons meaningful — the reference's analog
    discipline is 10-run averaged CUDA-event timing
    (/root/reference/test_flash_attention2.py:293-308)."""
    max_len = _cdiv(prompt_len, page_size) * page_size + gen_tokens * 6 + page_size
    params, caches, page_table, first = build_state(
        cfg, batch, prompt_len, max_len, page_size, cache_dtype,
        weight_dtype=weight_dtype, act_quant=act_quant,
    )
    n_lo, n_hi = gen_tokens, gen_tokens * 5
    run_n = make_loop_fn(cfg, page_table, prompt_len,
                         horizon=prompt_len + n_hi + 1, page_size=page_size)
    # Warm-up must compile BOTH loop lengths before any timed run (each
    # static n is its own executable); donated caches thread forward.
    caches, toks = run_n(params, caches, first, n=n_lo)
    sync(toks)
    caches, toks = run_n(params, caches, first, n=n_hi)
    sync(toks)
    slopes = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        caches, toks = run_n(params, caches, first, n=n_lo)
        sync(toks)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        caches, toks = run_n(params, caches, first, n=n_hi)
        sync(toks)
        t_hi = time.perf_counter() - t0
        slopes.append(max(t_hi - t_lo, 1e-9) / (n_hi - n_lo))

    step_s = float(np.median(slopes))
    return {
        "tokens_per_sec_per_chip": batch / step_s,
        "step_ms": step_s * 1e3,
        "step_ms_min": round(min(slopes) * 1e3, 4),
        "step_ms_max": round(max(slopes) * 1e3, 4),
        "repeats": len(slopes),
        "batch": batch,
        "prompt_len": prompt_len,
        "cache_dtype": ("int4" if cache_dtype == "int4"
                        else str(jnp.dtype(cache_dtype))),
        "weight_dtype": (
            "w8a8" if act_quant
            else "int4" if weight_dtype == "int4"
            else str(jnp.dtype(weight_dtype)) if weight_dtype is not None
            else "bf16"
        ),
        "model": dataclass_summary(cfg),
    }


def dataclass_summary(cfg: TransformerConfig) -> str:
    return (f"L{cfg.n_layers}_d{cfg.d_model}_h{cfg.n_heads}"
            f"kv{cfg.n_kv_heads}_ff{cfg.d_ff}")


def measure_engine_throughput(
    cfg: TransformerConfig,
    batch: int = 16,
    prompt_len: int = 128,
    gen_tokens: int = 64,
    cache_dtype=jnp.int8,
    mesh=None,
    spec_tokens: int = 0,
    draft_layers: int = 1,
    spec_mode: str = "draft",
    prefill_chunk: int | None = None,
    decode_burst: int = 1,
) -> dict:
    """END-TO-END engine tokens/sec including the host scheduler (admission,
    page allocation, retire) — the number a serving deployment sees; the
    device-loop measurement above is its upper bound.  With sampling fused
    into the device step, each engine step costs exactly one sampled-token
    readback.

    CAVEAT: on a TUNNELED PJRT backend (the axon dev environment) every
    dispatch pays a ~30-60 ms network round trip, so this wall measurement
    reflects tunnel latency, not scheduler cost — use the device-loop slope
    measurement there; on locally-attached chips the readback is sub-ms and
    this number is the honest serving throughput."""
    from cuda_flash_attention_tpu.decode.engine import DecodeEngine
    from cuda_flash_attention_tpu.models.transformer import init_params

    params = init_params(jax.random.PRNGKey(0), cfg)
    max_len = prompt_len + gen_tokens + 1 + spec_tokens
    spec_kw = {}
    if spec_tokens and spec_mode == "prompt_lookup":
        spec_kw = dict(spec_tokens=spec_tokens, spec_mode="prompt_lookup")
    elif spec_tokens:
        # Draft = a truncated copy of the target (first draft_layers layers,
        # same embeddings) — a realistic high-acceptance draft without
        # training a second model.
        import dataclasses

        draft_cfg = dataclasses.replace(cfg, n_layers=draft_layers)
        draft_params = {
            "embed": params["embed"],
            "layers": params["layers"][:draft_layers],
            "final_norm": params["final_norm"],
            "lm_head": params["lm_head"],
        }
        spec_kw = dict(
            draft_params=draft_params, draft_cfg=draft_cfg,
            spec_tokens=spec_tokens,
        )
    eng = DecodeEngine(
        params, cfg, max_seqs=batch, max_seq_len=max_len,
        cache_dtype=cache_dtype, mesh=mesh, prefill_chunk=prefill_chunk,
        decode_burst=decode_burst, **spec_kw,
    )
    prompts = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (batch, prompt_len)
    ).tolist()
    reqs = eng.submit_many(prompts, max_new_tokens=gen_tokens)
    eng.step()  # first decode step compiles
    tokens_before = sum(len(r.generated) for r in reqs)
    t0 = time.perf_counter()
    steps = 0
    while any(eng.active):
        eng.step()
        steps += 1
    dt = time.perf_counter() - t0
    timed_tokens = sum(len(r.generated) for r in reqs) - tokens_before
    # Per-token-step cost: one "token step" advances every active sequence
    # by one token, so timed_tokens/batch token steps elapsed.  Comparable
    # to the device loop's step_ms (VERDICT r3 item 6: track the overhead).
    token_steps = max(timed_tokens / max(batch, 1), 1e-9)
    return {
        "engine_tokens_per_sec": timed_tokens / dt,
        "engine_step_ms": dt / max(steps, 1) * 1e3,
        "engine_ms_per_token_step": dt / token_steps * 1e3,
        "decode_burst": decode_burst,
        "steps": steps,
        "timed_tokens": timed_tokens,
        "cache_dtype": ("int4" if cache_dtype == "int4"
                        else str(jnp.dtype(cache_dtype))),
        "tp": 1 if mesh is None else int(np.prod(list(mesh.shape.values()))),
        "spec_tokens": spec_tokens,
        "spec_mode": spec_mode if spec_tokens else None,
        "spec_acceptance": eng.acceptance_rate,
        "prefill_chunk": prefill_chunk,
        "prefill_chunks_run": eng.stats["prefill_chunks"],
    }


def tp_decode_dryrun(cfg: TransformerConfig, tp: int = 2, batch: int = 4,
                     gen_tokens: int = 4) -> dict:
    """TP serving dry-run on the virtual CPU fabric: the full DecodeEngine
    with KV pages + heads sharded over the 'model' axis executes a short
    generation — proves the multi-chip decode path compiles and runs
    (throughput is meaningless on the CPU mesh; the driver validates the
    path, real slices measure it)."""
    from cuda_flash_attention_tpu.parallel.mesh import cpu_test_mesh

    if len(jax.devices("cpu")) < tp:
        raise RuntimeError(
            f"tp={tp} dry-run needs {tp} virtual CPU devices: export "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={tp} before "
            f"starting Python (pytest's conftest.py does this)"
        )
    mesh = cpu_test_mesh({"model": tp})
    out = measure_engine_throughput(
        cfg, batch=batch, prompt_len=128, gen_tokens=gen_tokens,
        cache_dtype=jnp.int8, mesh=mesh,
    )
    out["dryrun"] = True
    return out


def _cache_dtype(args):
    return (
        "int4" if args.cache_dtype == "int4"
        else jnp.dtype(args.cache_dtype)
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--prompt-len", type=int, default=128)
    p.add_argument("--gen", type=int, default=64)
    p.add_argument("--cache-dtype", default="int8",
                   choices=["int4", "int8", "float8_e4m3fn", "bfloat16",
                            "float32"])
    p.add_argument("--page-size", type=int, default=128,
                   help="KV page size in tokens (long contexts amortize "
                        "per-page grid overhead with bigger pages)")
    p.add_argument("--flagship", action="store_true",
                   help="use the flagship config instead of the bench default")
    p.add_argument("--config", choices=["tiny", "flagship", "base"],
                   default=None,
                   help="model config (base = the 254M production shape)")
    p.add_argument("--weight-dtype", default=None,
                   choices=["int8", "float8_e4m3fn", "int4"],
                   help="weight-only quantization of the dense projections "
                        "(int4 = packed group-wise capacity form)")
    p.add_argument("--w8a8", action="store_true",
                   help="with --weight-dtype int8: quantize activations too "
                        "(native int8 MXU matmul)")
    p.add_argument("--spec", type=int, default=0, metavar="K",
                   help="with --engine: speculative decoding, K draft "
                        "tokens per round (draft = first --draft-layers "
                        "layers of the target)")
    p.add_argument("--draft-layers", type=int, default=1)
    p.add_argument("--spec-mode", default="draft",
                   choices=["draft", "prompt_lookup"],
                   help="speculation proposer: a draft model, or n-gram "
                        "prompt lookup (no second model)")
    p.add_argument("--prefill-chunk", type=int, default=None,
                   help="with --engine: chunked prefill — prompts longer "
                        "than this advance one chunk per engine step")
    p.add_argument("--engine", action="store_true",
                   help="measure END-TO-END engine throughput (host "
                        "scheduler included) instead of the device loop")
    p.add_argument("--burst", type=int, default=1,
                   help="with --engine: decode_burst — chained device steps "
                        "per dispatch (one readback per burst)")
    p.add_argument("--device-ratio", action="store_true",
                   help="with --engine: also run the device-loop slope "
                        "measurement on the same config and emit "
                        "engine_ms_per_token_step / device step_ms — the "
                        "host-scheduler overhead factor")
    p.add_argument("--tp-dryrun", type=int, default=0, metavar="TP",
                   help="run the tensor-parallel decode path on a TP-way "
                        "virtual CPU mesh (validation, not a speed number)")
    p.add_argument("--repeats", type=int, default=5,
                   help="device-loop slope measurements; the MEDIAN is "
                        "reported with the min/max spread")
    p.add_argument("--platform", default=None,
                   help="pin the JAX platform (e.g. 'cpu') BEFORE any "
                        "backend initializes — env-var routes are too late "
                        "when sitecustomize imports jax at startup, so a "
                        "'CPU' run can silently escape to the tunneled "
                        "chip without this (round-4 verdict, item 1)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    out_platform = jax.default_backend()

    name = args.config or ("flagship" if args.flagship else "tiny")
    cfg = {
        "tiny": TransformerConfig.tiny,
        "base": TransformerConfig.base,
        "flagship": lambda: TransformerConfig(
            vocab_size=2048, d_model=512, n_layers=4, n_kv_heads=4,
            n_heads=8, head_dim=64, d_ff=1536,
        ),
    }[name]()
    weight_dtype = (
        args.weight_dtype if args.weight_dtype == "int4"
        else jnp.dtype(args.weight_dtype) if args.weight_dtype else None
    )
    if args.tp_dryrun:
        out = tp_decode_dryrun(cfg, tp=args.tp_dryrun, batch=args.batch)
    elif args.engine:
        out = measure_engine_throughput(
            cfg, batch=args.batch, prompt_len=args.prompt_len,
            gen_tokens=args.gen, cache_dtype=_cache_dtype(args),
            spec_tokens=args.spec, draft_layers=args.draft_layers,
            spec_mode=args.spec_mode, prefill_chunk=args.prefill_chunk,
            decode_burst=args.burst,
        )
        if args.device_ratio:
            dev = measure_decode_throughput(
                cfg, batch=args.batch, prompt_len=args.prompt_len,
                gen_tokens=args.gen, cache_dtype=_cache_dtype(args),
                repeats=args.repeats,
            )
            out["device_step_ms"] = dev["step_ms"]
            out["engine_overhead_x"] = (
                out["engine_ms_per_token_step"] / max(dev["step_ms"], 1e-9)
            )
    else:
        out = measure_decode_throughput(
            cfg, batch=args.batch, prompt_len=args.prompt_len,
            gen_tokens=args.gen, cache_dtype=_cache_dtype(args),
            weight_dtype=weight_dtype, act_quant=args.w8a8,
            page_size=args.page_size, repeats=args.repeats,
        )
        out["page_size"] = args.page_size
    out["platform"] = out_platform
    print(json.dumps(out))


if __name__ == "__main__":
    main()
