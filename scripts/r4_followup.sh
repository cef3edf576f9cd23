#!/usr/bin/env bash
# Post-campaign chip batch (round 4 cont.): waits for the running campaign
# to release the chip, then measures
#   1. D=128 roofline (block sweep) — substantiates ROOFLINE.md's claim
#      that the D=64 MXU derate is the structural residual,
#   2. engine host-overhead factor on-chip (engine vs device-loop ratio),
#   3. north-star config 4 shape: GQA decode over a long (S=8192) paged
#      INT8 KV context on the production-scale base model.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
export JAX_PLATFORMS=axon

if [ "${1:-}" != "" ]; then
  echo "waiting on pid $1 (campaign)..."
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

run() {
  local log="$1"; shift
  echo "=== $* -> $log"
  timeout 3000 "$@" 2>&1 | grep -v -E "WARNING:|I0000" | tee "logs/$log"
}

run d128_roofline.log python scripts/r4_d128_roofline.py sweep

run engine_device_ratio.log python -m cuda_flash_attention_tpu.bench.decode_bench \
  --config flagship --engine --batch 16 --prompt-len 128 --gen 64 \
  --burst 8 --device-ratio

run decode_s8192.log python -m cuda_flash_attention_tpu.bench.decode_bench \
  --config base --batch 8 --prompt-len 8192 --gen 32 --cache-dtype int8

echo "followup done"
