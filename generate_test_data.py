#!/usr/bin/env python3
"""Seeded Q/K/V fixture generator.

Contract parity with /root/reference/generate_test_data.py:6-50: seeded
(default 42) standard-normal fp32 tensors of shape (B, H, S, D) written as
raw .bin blobs under data/B{B}_H{H}_S{S}_D{D}/.
"""

import argparse
import os

import numpy as np

from cuda_flash_attention_tpu.utils.io import data_dir_name, save_binary_file


def generate(batch, heads, seq, head_dim, out_root="data", seed=42,
             with_do=False):
    rng = np.random.default_rng(seed)
    d = os.path.join(out_root, data_dir_name(batch, heads, seq, head_dim))
    os.makedirs(d, exist_ok=True)
    shape = (batch, heads, seq, head_dim)
    for name in ("Q", "K", "V") + (("dO",) if with_do else ()):
        save_binary_file(
            os.path.join(d, f"{name}.bin"),
            rng.standard_normal(shape).astype(np.float32),
        )
    print(f"wrote {'Q K V' + (' dO' if with_do else '')} -> {d}")
    return d


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", "-B", type=int, default=2)
    p.add_argument("--heads", "-H", type=int, default=8)
    p.add_argument("--seq", "-S", type=int, default=512)
    p.add_argument("--head-dim", "-D", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", default="data")
    p.add_argument("--with-do", action="store_true",
                   help="also write a dO.bin (otherwise backward uses dO=1)")
    a = p.parse_args()
    generate(a.batch, a.heads, a.seq, a.head_dim, a.out, a.seed, a.with_do)


if __name__ == "__main__":
    main()
