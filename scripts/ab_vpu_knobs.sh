#!/bin/bash
# On-chip A/B of CFA_BF16_VPU_CHAIN x CFA_BWD_STAT_FOLD (4 combos,
# fresh process each; first run per combo pays a Mosaic compile).
cd "$(dirname "$0")/.."
for chain in 1 0; do
  for fold in 1 0; do
    CFA_BF16_VPU_CHAIN=$chain CFA_BWD_STAT_FOLD=$fold \
      timeout 550 python scripts/ab_vpu_knobs.py
  done
done
