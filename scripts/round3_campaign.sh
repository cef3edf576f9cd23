#!/bin/bash
# Round-3 on-chip measurement campaign.  Run AFTER the tunnel is healthy
# (scripts/../tmp watcher or a 2-line matmul probe).  Each step logs to
# logs/ and is independently restartable; first compiles are slow
# (20-60 s/shape through the remote Mosaic relay).
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

# 1. Knob A/B: bf16 softmax chain x backward stat fold (4 fresh processes).
./scripts/ab_vpu_knobs.sh 2>&1 | tee logs/ab_vpu_knobs.log

# 2. Headline bench (the driver's metric; includes decode+train extras).
timeout 1200 python bench.py 2>&1 | tee logs/bench.log

# 3. 10-config experiment cross + artifact regeneration.
timeout 3600 python -m cuda_flash_attention_tpu.bench \
  --experiment --save-results --no-stop-on-failure \
  2>&1 | tee logs/experiment.log

# 4. Long-context seqlen sweep (8k-32k points) + artifacts.
timeout 3600 python -m cuda_flash_attention_tpu.bench \
  --seqlen-experiment --extended --save-results --no-stop-on-failure \
  2>&1 | tee logs/seqlen_extended.log

# 5. Base-config (254M) decode: bf16 vs int8-weight vs W8A8, scanned loop.
for wflags in "" "--weight-dtype int8" "--weight-dtype int8 --w8a8"; do
  timeout 1800 python -m cuda_flash_attention_tpu.bench.decode_bench \
    --config base --batch 16 --prompt-len 128 --gen 32 $wflags \
    2>&1 | tee -a logs/decode_base.log
done

# 6. Flagship decode int8/fp8 KV (BASELINE.md continuity rows).
for cd in int8 float8_e4m3fn; do
  timeout 1200 python -m cuda_flash_attention_tpu.bench.decode_bench \
    --flagship --batch 16 --cache-dtype $cd 2>&1 | tee -a logs/decode_flagship.log
done

# 7. Backward block re-sweep at the new kernel (autotuner, bwd kernels).
timeout 3600 python -m cuda_flash_attention_tpu.bench.autotune \
  --kernels fused --seq 2048 --tile bf16 --causal both \
  --json plots/autotune_bwd_r3.json 2>&1 | tee logs/autotune_bwd.log

# 8. Speculative decoding: bf16 engine throughput, plain vs --spec (draft =
#    first 2 layers of the base target) — the accepted-tokens-per-pass win.
for sflags in "" "--spec 4 --draft-layers 2"; do
  timeout 1800 python -m cuda_flash_attention_tpu.bench.decode_bench \
    --config base --engine --batch 8 --prompt-len 128 --gen 64 \
    --cache-dtype bfloat16 $sflags 2>&1 | tee -a logs/spec_decode.log
done

# 8b. Chunked prefill: long-prompt admission latency bounded per step —
#     engine throughput with and without prefill chunking (B8, 2k prompts).
for cflags in "" "--prefill-chunk 512"; do
  timeout 1800 python -m cuda_flash_attention_tpu.bench.decode_bench \
    --config base --engine --batch 8 --prompt-len 2048 --gen 32 \
    --cache-dtype int8 $cflags 2>&1 | tee -a logs/chunked_prefill.log
done

# 9. Sliding-window long-context prefill: S=16k global vs window=4k — the
#    O(S*W) vs O(S^2/2) wall-clock gap on the real chip.
timeout 1800 python - <<'PY' 2>&1 | tee logs/window_prefill.log
import json
import jax, jax.numpy as jnp
from cuda_flash_attention_tpu import flash_attention
from cuda_flash_attention_tpu.utils.timing import device_benchmark

ks = jax.random.split(jax.random.PRNGKey(0), 3)
B, H, S, D = 1, 8, 16384, 64
q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16) for kk in ks)
rows = {}
for label, win in (("global", None), ("win4096", 4096)):
    fn = jax.jit(lambda q, k, v, w=win: flash_attention(
        q, k, v, causal=True, window=w, tile_dtype=jnp.bfloat16,
        force_kernel=True))
    ms = device_benchmark(fn, q, k, v)
    rows[label] = round(ms, 3)
    print(label, ms)
rows["speedup"] = round(rows["global"] / rows["win4096"], 2)
print(json.dumps({"window_prefill_ms": rows}))
PY

# 9b. INT4 KV cache: on-chip Mosaic compile smoke + decode throughput
#     (the split-half nibble unpack is CPU-validated; this proves the
#     compiled form) — opt-in feature, failure here must not kill the run.
( set -o pipefail; timeout 1200 python -m cuda_flash_attention_tpu.bench.decode_bench \
  --flagship --batch 16 --cache-dtype int4 \
  2>&1 | tee logs/decode_int4.log ) \
  || echo "int4 on-chip smoke FAILED (opt-in feature)" | tee -a logs/decode_int4.log

# 10. Collect every JSON line the steps emitted into one summary file so
#     the next session can update BASELINE.md without re-parsing logs.
python - <<'PY'
import json, os, re
out = []
for name in sorted(os.listdir("logs")):
    if not name.endswith(".log"):
        continue
    for line in open(os.path.join("logs", name), errors="replace"):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                out.append({"log": name, "data": json.loads(line)})
            except Exception:
                pass
json.dump(out, open("logs/campaign_summary.json", "w"), indent=1)
print(f"campaign_summary.json: {len(out)} JSON lines collected")
PY
echo "ROUND-3 CAMPAIGN COMPLETE"
