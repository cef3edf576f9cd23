"""Round-4 speculation-win demo (VERDICT item 7).

Round 3's only speculation measurement used a RANDOM-weight draft (0.3%
acceptance, 2x throughput LOSS).  This benchmark exercises speculation's
actual design case: a model whose continuations are predictable.

  1. TRAIN the flagship model for a few hundred AdamW steps on a corpus of
     repeated 32-token patterns until greedy continuation reproduces the
     pattern (a stand-in for natural-language redundancy — extractive /
     templated serving workloads).
  2. Serve a prompt holding 2+ pattern repetitions with (a) the plain
     engine and (b) prompt-lookup speculation (no draft model) at k=7.

Reports wall tokens/sec for both, speculative acceptance, and device
dispatches per token (the dispatch amortization is the honest win on ANY
backend; on the tunneled dev chip wall clock is dispatch-dominated, so the
wall ratio overstates what a locally-attached chip would see — dispatches
per token is the transferable number).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cuda_flash_attention_tpu.decode.engine import DecodeEngine
from cuda_flash_attention_tpu.models.training import (
    init_train_state,
    make_optax_train_step,
    make_optimizer,
)
from cuda_flash_attention_tpu.models.transformer import (
    TransformerConfig,
    init_params,
)


def flagship():
    return TransformerConfig(
        vocab_size=2048, d_model=512, n_layers=4, n_heads=8, n_kv_heads=4,
        head_dim=64, d_ff=1536,
    )


def make_corpus(rng, n_seqs, seq_len, pattern_len=32, vocab=2048):
    """Each row tiles one of 8 fixed random patterns — enough structure to
    learn, varied enough to need the prompt (not just memorized output)."""
    pats = rng.integers(1, vocab, (8, pattern_len))
    rows = []
    for i in range(n_seqs):
        p = pats[rng.integers(0, len(pats))]
        reps = -(-seq_len // pattern_len)
        rows.append(np.tile(p, reps)[:seq_len])
    return np.stack(rows), pats


def train(cfg, steps=300, batch=16, seq=256, seed=0):
    rng = np.random.default_rng(seed)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    opt = make_optimizer(learning_rate=3e-4)
    state = init_train_state(params, opt)
    step = jax.jit(make_optax_train_step(cfg, opt), donate_argnums=(0,))
    corpus, pats = make_corpus(rng, 4096, seq, vocab=cfg.vocab_size)
    t0 = time.perf_counter()
    for i in range(steps):
        idx = rng.integers(0, len(corpus), batch)
        toks = jnp.asarray(corpus[idx])
        state, metrics = step(state, toks)
        if i % 100 == 0:
            print(f"  step {i}: loss {float(metrics['loss']):.3f}",
                  flush=True)
    jax.block_until_ready(state.params)
    print(f"  trained {steps} steps in {time.perf_counter()-t0:.0f}s, "
          f"final loss {float(metrics['loss']):.3f}", flush=True)
    return state.params, pats


def serve(params, cfg, prompts, *, spec=0, gen=64, lookup_ngram=3,
          burst=1):
    kw = {}
    if spec:
        kw = dict(spec_tokens=spec, spec_mode="prompt_lookup",
                  lookup_ngram=lookup_ngram)
    eng = DecodeEngine(params, cfg, max_seqs=len(prompts),
                       max_seq_len=1024, page_size=128,
                       cache_dtype=jnp.int8, decode_burst=burst, **kw)
    reqs = eng.submit_many(prompts, max_new_tokens=gen)
    eng.step()  # compile
    tok0 = sum(len(r.generated) for r in reqs)
    steps0 = eng.stats["steps"] + eng.stats["spec_rounds"]
    t0 = time.perf_counter()
    while any(eng.active) or eng._pending:
        eng.step()
    dt = time.perf_counter() - t0
    tokens = sum(len(r.generated) for r in reqs) - tok0
    disp = (eng.stats["steps"] + eng.stats["spec_rounds"]) - steps0
    acc = None
    if eng.stats["spec_proposed"]:
        acc = eng.stats["spec_accepted"] / eng.stats["spec_proposed"]
    return {
        "tokens_per_sec": tokens / dt,
        "dispatches_per_token": disp / max(tokens, 1),
        "acceptance": acc,
        "generated": [r.generated for r in reqs],
    }


def main():
    import pickle, os
    cfg = flagship()
    cache = "/tmp/cfa_verify/spec_win_params.pkl"
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    if os.path.exists(cache):
        print("loading cached trained params...", flush=True)
        with open(cache, "rb") as f:
            host_params, pats = pickle.load(f)
        params = jax.tree.map(jnp.asarray, host_params)
    else:
        print("training flagship on repetitive corpus...", flush=True)
        params, pats = train(cfg, steps=steps)
        with open(cache, "wb") as f:
            pickle.dump((jax.tree.map(np.asarray, params), pats), f)

    # Prompts: 2.5 repetitions of a training pattern each.
    prompts = [np.tile(pats[i % len(pats)], 3)[:80].tolist()
               for i in range(8)]

    stage = sys.argv[2] if len(sys.argv) > 2 else "all"
    out = {}
    if stage in ("all", "base"):
        base = serve(params, cfg, prompts, spec=0)
        out.update(base_tokens_per_sec=round(base["tokens_per_sec"], 1),
                   base_dispatches_per_token=round(
                       base["dispatches_per_token"], 3))
    if stage in ("all", "burst"):
        b8 = serve(params, cfg, prompts, spec=0, burst=8)
        out.update(burst8_tokens_per_sec=round(b8["tokens_per_sec"], 1))
    if stage in ("all", "spec"):
        spec = serve(params, cfg, prompts, spec=7)
        out.update(spec_tokens_per_sec=round(spec["tokens_per_sec"], 1),
                   acceptance=round(spec["acceptance"], 3),
                   spec_dispatches_per_token=round(
                       spec["dispatches_per_token"], 3))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
