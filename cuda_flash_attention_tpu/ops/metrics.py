"""Accuracy and performance metric accounting.

Parity with the reference harness's compute_metrics
(/root/reference/test_flash_attention2.py:569-606), keeping its FLOPS and
bandwidth conventions so TPU numbers are comparable with BASELINE.md:

  forward flops   = 4 * B * H * S_q * S_kv * D
  backward flops  = 2.5x forward            (test_flash_attention2.py:634)
  bandwidth bytes = B*H*S*D * 4 tensors * itemsize
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Metrics:
    max_abs_error: float
    mean_abs_error: float
    mse: float
    max_rel_error: float
    has_nan: bool
    has_inf: bool

    @property
    def ok(self) -> bool:
        return not (self.has_nan or self.has_inf)

    def passes(self, tolerance: float) -> bool:
        # Pass criterion parity: max_abs_error < tol AND no NaN/Inf
        # (/root/reference/test_flash_attention2.py:1018-1020).
        return self.ok and self.max_abs_error < tolerance


def compute_metrics(result, reference, eps: float = 1e-8) -> Metrics:
    result = np.asarray(result, dtype=np.float64)
    reference = np.asarray(reference, dtype=np.float64)
    diff = np.abs(result - reference)
    return Metrics(
        max_abs_error=float(diff.max()) if diff.size else 0.0,
        mean_abs_error=float(diff.mean()) if diff.size else 0.0,
        mse=float((diff**2).mean()) if diff.size else 0.0,
        max_rel_error=float((diff / (np.abs(reference) + eps)).max()) if diff.size else 0.0,
        has_nan=bool(np.isnan(result).any()),
        has_inf=bool(np.isinf(result).any()),
    )


def attention_flops(
    batch: int, heads: int, q_len: int, kv_len: int, head_dim: int,
    *, mode: str = "forward", causal: bool = False,
) -> float:
    """FLOP count, reference convention (4*B*H*S^2*D fwd; bwd = 2.5x fwd)."""
    fwd = 4.0 * batch * heads * q_len * kv_len * head_dim
    if causal:
        fwd /= 2.0
    if mode == "forward":
        return fwd
    if mode == "backward":
        return 2.5 * fwd
    if mode in ("both", "forward_backward"):
        return 3.5 * fwd
    raise ValueError(f"unknown mode {mode!r}")


def attention_io_bytes(
    batch: int, heads: int, q_len: int, kv_len: int, head_dim: int,
    *, itemsize: int = 4,
) -> float:
    """Bandwidth accounting parity: Q,K,V,O only, 4 tensors
    (/root/reference/test_flash_attention2.py:592-594 counts B*H*S*D*4*4)."""
    q_bytes = batch * heads * q_len * head_dim * itemsize
    kv_bytes = batch * heads * kv_len * head_dim * itemsize
    return float(2 * q_bytes + 2 * kv_bytes)  # Q + O + K + V


def tflops(flops: float, time_s: float) -> float:
    return flops / time_s / 1e12 if time_s > 0 else 0.0


def gbps(nbytes: float, time_s: float) -> float:
    return nbytes / time_s / 1e9 if time_s > 0 else 0.0
