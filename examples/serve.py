#!/usr/bin/env python3
"""End-to-end serving example: continuous batching over a paged quantized
KV cache with the full sampling/serving API.

Runs anywhere (one TPU chip, or CPU with kernels interpreted):

    python examples/serve.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from cuda_flash_attention_tpu.decode import DecodeEngine
from cuda_flash_attention_tpu.models import TransformerConfig, init_params


def main():
    # Toy model (swap in utils.hf_convert.load_llama for real weights).
    cfg = TransformerConfig(
        vocab_size=2048, d_model=256, n_layers=4, n_heads=8, n_kv_heads=4,
        head_dim=32, d_ff=512,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)

    eng = DecodeEngine(
        params, cfg,
        max_seqs=4,                 # concurrent sequences
        max_seq_len=1024,
        cache_dtype=jnp.int8,       # paged INT8 KV cache
        temperature=0.8, top_p=0.95, min_p=0.02,
        logprobs=True,
        prefill_chunk=256,          # long prompts advance chunk-by-chunk
        prefix_cache=True,          # shared prompt prefixes stored once
        decode_burst=8,             # N chained steps per device dispatch
    )

    system_prompt = list(range(1, 257))  # stands in for a shared system prompt
    requests = eng.submit_many(
        [system_prompt + [300 + i] for i in range(4)],
        max_new_tokens=24,
        stop=[[0]],                         # stop sequence (token ids)
        logit_bias={1999: float("-inf")},   # ban a token
        presence_penalty=0.2,
        on_token=lambda t: None,            # streaming hook
    )
    while any(not r.done for r in requests):
        eng.step()
    eng.step()  # final retire

    for r in requests:
        print(f"req {r.uid}: {len(r.generated)} tokens, "
              f"first logprobs {[round(x, 2) for x in r.logprobs[:4]]}")
    print("engine stats:", eng.stats)


if __name__ == "__main__":
    main()
