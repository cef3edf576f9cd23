#!/bin/bash
# Round-5 evidence campaign: regenerates EVERY published number atomically
# into the COMMITTED evidence/r5/ directory (round-4 verdict item 7: the
# evidence chain must regenerate at snapshot time; logs/ is gitignored, so
# published claims had no committed artifacts).
#
# Usage:  bash scripts/round5_campaign.sh [--skip-slow] [--skip-suite]
# Run from the repo root on the chip-attached host.  Each stage appends to
# evidence/r5/; stages are independently resumable (re-run overwrites).
set -uo pipefail
cd "$(dirname "$0")/.."
EV=evidence/r5
mkdir -p "$EV"
SKIP_SLOW=0; SKIP_SUITE=0
for a in "$@"; do
  [ "$a" = --skip-slow ] && SKIP_SLOW=1
  [ "$a" = --skip-suite ] && SKIP_SUITE=1
done

stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }
echo "campaign start $(stamp) @ $(git rev-parse --short HEAD)" | tee "$EV/MANIFEST"

# ---- 1. test suites (virtual CPU mesh) -----------------------------------
if [ "$SKIP_SUITE" = 0 ]; then
  echo "== suite (not slow) $(stamp)" | tee -a "$EV/MANIFEST"
  timeout 5400 python -m pytest tests/ -q -m "not slow" 2>&1 | tail -40 > "$EV/test_suite.log"
  tail -1 "$EV/test_suite.log" | tee -a "$EV/MANIFEST"
  if [ "$SKIP_SLOW" = 0 ]; then
    echo "== full suite incl slow $(stamp)" | tee -a "$EV/MANIFEST"
    timeout 10800 python -m pytest tests/ -q 2>&1 | tail -40 > "$EV/full_suite.log"
    tail -1 "$EV/full_suite.log" | tee -a "$EV/MANIFEST"
  fi
fi

# ---- 2. kernel headline + extras (bench.py, real chip) --------------------
echo "== bench.py $(stamp)" | tee -a "$EV/MANIFEST"
timeout 3000 python bench.py > "$EV/bench.json" 2> "$EV/bench.err"
tail -c 400 "$EV/bench.json" | tee -a "$EV/MANIFEST"; echo >> "$EV/MANIFEST"

# ---- 3. decode campaign: median-of-5 device loops -------------------------
for dt in int8 float8_e4m3fn int4 bfloat16; do
  echo "== decode $dt $(stamp)" | tee -a "$EV/MANIFEST"
  timeout 1200 python -m cuda_flash_attention_tpu.bench.decode_bench \
    --flagship --gen 192 --cache-dtype "$dt" 2>/dev/null | tail -1 > "$EV/decode_$dt.json"
  cat "$EV/decode_$dt.json" | tee -a "$EV/MANIFEST"
done

# ---- 4. engine scheduler cost: on-chip bursts + TRUE-CPU ratio -------------
for burst in 8 32 64; do
  echo "== engine burst $burst (chip) $(stamp)" | tee -a "$EV/MANIFEST"
  timeout 1800 python -m cuda_flash_attention_tpu.bench.decode_bench \
    --engine --burst "$burst" --flagship --batch 16 --gen 64 2>/dev/null \
    | tail -1 > "$EV/engine_burst${burst}_chip.json"
  cat "$EV/engine_burst${burst}_chip.json" | tee -a "$EV/MANIFEST"
done
echo "== engine device-ratio (TRUE cpu backend) $(stamp)" | tee -a "$EV/MANIFEST"
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 2400 \
  python -m cuda_flash_attention_tpu.bench.decode_bench \
  --engine --device-ratio --burst 8 --flagship --batch 16 --gen 32 \
  --platform cpu 2>/dev/null | tail -1 > "$EV/engine_device_ratio_cpu.json"
cat "$EV/engine_device_ratio_cpu.json" | tee -a "$EV/MANIFEST"

# ---- 5. head-dim frontier: D=128 (in bench.json) + D=256 sweep -------------
echo "== d256 sweep $(stamp)" | tee -a "$EV/MANIFEST"
timeout 3000 python scripts/r5_d256_point.py 2>/dev/null > "$EV/d256_sweep.log"
grep BEST "$EV/d256_sweep.log" | tee -a "$EV/MANIFEST"

# ---- 6. window compact-grid A/B with sinks (verdict item 9 criterion) ------
echo "== window+sinks A/B $(stamp)" | tee -a "$EV/MANIFEST"
timeout 2400 python scripts/r5_window_sinks_ab.py 2>/dev/null > "$EV/window_sinks_ab.log"
tail -5 "$EV/window_sinks_ab.log" | tee -a "$EV/MANIFEST"

# ---- 7. train step: throughput + per-op profile ----------------------------
echo "== train bench (flagship) $(stamp)" | tee -a "$EV/MANIFEST"
timeout 1800 python -m cuda_flash_attention_tpu.bench.train_bench --batch 4 --seq 2048 \
  2>/dev/null | tail -1 > "$EV/train_flagship.json"
cat "$EV/train_flagship.json" | tee -a "$EV/MANIFEST"
echo "== train profile (base 254M) $(stamp)" | tee -a "$EV/MANIFEST"
timeout 2400 python scripts/r5_train_profile.py 2>/dev/null > "$EV/train_profile_base.log"
head -8 "$EV/train_profile_base.log" | tee -a "$EV/MANIFEST"

# ---- 8. spec decode: prompt-lookup win + draft-model attempt ----------------
echo "== spec win (prompt lookup) $(stamp)" | tee -a "$EV/MANIFEST"
timeout 2400 python scripts/r4_spec_win.py 2>/dev/null | tail -6 > "$EV/spec_win.log"
cat "$EV/spec_win.log" | tee -a "$EV/MANIFEST"

echo "campaign done $(stamp)" | tee -a "$EV/MANIFEST"
