"""Round-4 bisect: decode step scan-vs-loop layer form on the real chip.

BENCH_r02 (pre-scan, Python layer loop): int8 0.174 ms/step, 92k tok/s.
BENCH_r03 (lax.scan over stacked layers): int8 0.5 ms/step, 32k tok/s.
This measures both forms at HEAD on identical state to attribute the
regression to the layer-loop form (scan slices of the stacked cache and
stacked weights force per-layer HBM copies) vs anything else in round 3.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cuda_flash_attention_tpu.bench.decode_bench import build_state, _cdiv
from cuda_flash_attention_tpu.decode.kv_cache import (
    KVPages,
    PageAllocator,
    init_kv_pages,
    write_prompt_kv,
)
from cuda_flash_attention_tpu.decode.model import decode_step, prefill_forward
from cuda_flash_attention_tpu.models.transformer import (
    TransformerConfig,
    init_params,
)
from cuda_flash_attention_tpu.utils.timing import sync


def measure(run_n, params, caches, first, n_lo=32, n_hi=160):
    caches, toks = run_n(params, caches, first, n=n_lo)
    sync(toks)
    caches, toks = run_n(params, caches, first, n=n_hi)
    sync(toks)
    best_lo = best_hi = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        caches, toks = run_n(params, caches, first, n=n_lo)
        sync(toks)
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        caches, toks = run_n(params, caches, first, n=n_hi)
        sync(toks)
        best_hi = min(best_hi, time.perf_counter() - t0)
    return max(best_hi - best_lo, 1e-9) / (n_hi - n_lo)


def build_state_list(cfg, batch, prompt_len, max_len, page_size=128,
                     cache_dtype=jnp.int8, seed=0):
    """Like bench.build_state but keeps LIST-form layers + per-layer caches
    (the round-2 loop path)."""
    params = init_params(jax.random.PRNGKey(seed), cfg)
    pages_per_seq = _cdiv(max_len, page_size)
    num_pages = batch * pages_per_seq + 1
    alloc = PageAllocator(num_pages)
    page_table = np.zeros((batch, pages_per_seq), np.int32)
    caches = [
        init_kv_pages(cfg.n_kv_heads, num_pages, page_size, cfg.head_dim,
                      cache_dtype)
        for _ in range(cfg.n_layers)
    ]
    tokens = jax.random.randint(
        jax.random.PRNGKey(seed + 1), (batch, prompt_len), 0, cfg.vocab_size
    )
    logits, kv_list = jax.jit(
        lambda p, t: prefill_forward(p, t, cfg)
    )(params, tokens)

    n_prompt_pages = _cdiv(prompt_len, page_size)
    kv_len = n_prompt_pages * page_size
    pad = kv_len - prompt_len
    for s in range(batch):
        ids = alloc.alloc(pages_per_seq)
        page_table[s, :] = ids
        ids_prompt = jnp.asarray(ids[:n_prompt_pages], jnp.int32)
        for li, (k_all, v_all) in enumerate(kv_list):
            ks = jnp.pad(k_all[s], ((0, pad), (0, 0), (0, 0)))
            vs = jnp.pad(v_all[s], ((0, pad), (0, 0), (0, 0)))
            caches[li] = write_prompt_kv(caches[li], ks, vs, ids_prompt)

    first = jnp.argmax(logits[:, prompt_len - 1, :], axis=-1).astype(jnp.int32)
    return params, caches, jnp.asarray(page_table), first


def make_loop_fn(cfg, page_table, start_len, list_form):
    active = jnp.ones((page_table.shape[0],), bool)

    @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(1,))
    def run_n(params, caches, tokens, n):
        def body(i, carry):
            caches, tokens = carry
            positions = jnp.full(tokens.shape, start_len, jnp.int32) + i
            logits, caches = decode_step(
                params, tokens, positions, caches, page_table, active, cfg
            )
            if list_form:
                caches = list(caches)
            return caches, jnp.argmax(logits, axis=-1).astype(jnp.int32)

        caches, tokens = jax.lax.fori_loop(0, n, body, (caches, tokens))
        return caches, tokens

    return run_n


def main():
    cfg = TransformerConfig(
        vocab_size=2048, d_model=512, n_layers=4, n_heads=8, n_kv_heads=4,
        head_dim=64, d_ff=1536,
    )
    batch, prompt_len, gen = 16, 128, 32
    page_size = 128
    max_len = _cdiv(prompt_len, page_size) * page_size + gen * 6 + page_size

    for form in ("scan", "loop"):
        if form == "scan":
            params, caches, table, first = build_state(
                cfg, batch, prompt_len, max_len, page_size, jnp.int8)
        else:
            params, caches, table, first = build_state_list(
                cfg, batch, prompt_len, max_len, page_size, jnp.int8)
        run_n = make_loop_fn(cfg, table, prompt_len, form == "loop")
        step_s = measure(run_n, params, caches, first, n_lo=gen, n_hi=gen * 5)
        print(f"{form}: step_ms={step_s*1e3:.3f} "
              f"tok/s={batch/step_s:,.0f}", flush=True)


if __name__ == "__main__":
    main()
