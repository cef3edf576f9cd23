#!/bin/bash
# On-chip A/B of CFA_BF16_VPU_CHAIN x CFA_BWD_STAT_FOLD x CFA_STATIC_MAX
# (fresh process each; first run per combo pays a Mosaic compile).
cd "$(dirname "$0")/.."
for chain in 1 0; do
  for fold in 1 0; do
    CFA_BF16_VPU_CHAIN=$chain CFA_BWD_STAT_FOLD=$fold \
      timeout 550 python scripts/ab_vpu_knobs.py
  done
done
# Static-max (VFA-style precomputed row bound): the forward drops the
# whole running-max/alpha VPU chain — A/B against the best online combo.
for sm in 1; do
  CFA_STATIC_MAX=$sm timeout 550 python scripts/ab_vpu_knobs.py
  CFA_STATIC_MAX=$sm CFA_BF16_VPU_CHAIN=0 \
    timeout 550 python scripts/ab_vpu_knobs.py
done
