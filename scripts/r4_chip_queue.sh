#!/usr/bin/env bash
# Chip-job queue for the rest of round 4: waits for the followup batch,
# then runs the pieces that failed or were added after it launched.
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=axon
while ! grep -q "followup done" logs/followup_r4.out 2>/dev/null; do sleep 30; done
timeout 3000 python scripts/r4_d128_roofline.py sweep 2>&1 | grep -v -E "WARNING:|I0000" | tee logs/d128_roofline.log
timeout 2400 python scripts/r4_window_ab.py 2>&1 | grep -v -E "WARNING:|I0000" | tee logs/window_ab.log
echo "chip queue done"
