#!/usr/bin/env bash
# Second chip batch: S=8192 decode retry (last_only fix) + window prefill
# re-measure at the new default blocks (compact grid, b=1024).
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=axon
run() { local log="$1"; shift; echo "=== $* -> $log";
  timeout 3000 "$@" 2>&1 | grep -v -E "WARNING:|I0000" | tee "logs/$log"; }

run decode_s8192.log python -m cuda_flash_attention_tpu.bench.decode_bench \
  --config base --batch 8 --prompt-len 8192 --gen 32 --cache-dtype int8

timeout 1800 python - <<'PY' 2>&1 | grep -v -E "WARNING:|I0000" | tee logs/window_prefill.log
import json
import jax, jax.numpy as jnp
from cuda_flash_attention_tpu import flash_attention
from cuda_flash_attention_tpu.utils.timing import device_benchmark

ks = jax.random.split(jax.random.PRNGKey(0), 3)
B, H, S, D = 1, 8, 16384, 64
q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16) for kk in ks)
secs = {}
for label, win in (("global", None), ("win4096", 4096)):
    fn = jax.jit(lambda q, k, v, w=win: flash_attention(
        q, k, v, causal=True, window=w, tile_dtype=jnp.bfloat16,
        force_kernel=True))
    secs[label] = device_benchmark(fn, q, k, v)  # returns SECONDS
speedup = secs["global"] / secs["win4096"]
rows = {k: round(v * 1e3, 3) for k, v in secs.items()}
rows["speedup"] = round(speedup, 2)
print(json.dumps({"window_prefill_ms": rows}))
PY
echo "chip queue2 done"
