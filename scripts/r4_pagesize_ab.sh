#!/usr/bin/env bash
# A/B: page-size granularity at long context (S=8192, base 254M, int8).
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=axon
for ps in 256 512 1024; do
  echo "=== page_size $ps"
  timeout 3000 python -m cuda_flash_attention_tpu.bench.decode_bench \
    --config base --batch 8 --prompt-len 8192 --gen 32 --cache-dtype int8 \
    --page-size $ps 2>&1 | grep -v -E "WARNING:|I0000"
done
echo "pagesize ab done"
