"""Benchmark + accuracy harness — behavior parity with the reference's
FlashAttention2Tester (/root/reference/test_flash_attention2.py:57-1362).

Oracles (SURVEY.md §4 translation):
  * pass/fail oracle: pure-jnp vanilla attention at HIGHEST precision
    (replaces PyTorch CPU hand-rolled attention, :197-208)
  * performance comparator: the same materialized attention timed on-device
    (replaces PyTorch GPU math-only SDPA, :210-218)
  * gradient oracle: jax autodiff of the vanilla op with L = sum(O)/sum(O*dO)
    (replaces torch autograd, :220-250)

Gates: max_abs_error < tolerance AND no NaN/Inf (:1018-1020); stop-on-first
failure by default (:1482).  Timing: warm-up + N averaged runs with a
readback fence (:284-308).  Backward mode feeds the kernel backward from the
ORACLE's forward artifacts (the reference quirk, :917-922); both mode feeds
it from the kernel's own (O, logsumexp) (:608-794).
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from cuda_flash_attention_tpu.bench.configs import TestConfig
from cuda_flash_attention_tpu.dispatch import run_flash_attention
from cuda_flash_attention_tpu.ops.metrics import (
    attention_flops,
    attention_io_bytes,
    compute_metrics,
)
from cuda_flash_attention_tpu.ops.reference import (
    reference_attention_grads,
    sdpa_attention,
    sdpa_attention_grads,
    vanilla_attention,
    vanilla_attention_chunked,
    vanilla_attention_with_lse,
)

# Above this score-matrix footprint the oracle runs Q-chunked (S=32k would
# otherwise materialize a 34 GB S x S buffer).
_ORACLE_CHUNK_BYTES = 1 << 30
from cuda_flash_attention_tpu.utils.timing import benchmark, device_benchmark


@dataclasses.dataclass
class TestResult:
    config: TestConfig
    test_type: str  # "forward" | "backward" | "both"
    passed: bool
    max_abs_error: float = float("nan")
    mean_abs_error: float = float("nan")
    mse: float = float("nan")
    max_rel_error: float = float("nan")
    # Error vs the INDEPENDENT second oracle (jax.nn SDPA) — the analog of
    # the reference's torch-GPU math-path comparator column
    # (test_flash_attention2.py:210-218).  Gated at the same tolerance.
    max_abs_error_sdpa: float = float("nan")
    kernel_time_ms: float = float("nan")
    oracle_time_ms: float = float("nan")
    speedup: float = float("nan")
    tflops: float = float("nan")
    bandwidth_gbps: float = float("nan")
    error_message: str = ""

    def as_row(self) -> dict:
        """CSV row with the reference's exact column schema
        (test_flash_attention2.py:1112-1117). TorchTime_ms carries the
        oracle (vanilla reference attention) time on this backend."""
        c = self.config
        return {
            "Test": c.name,
            "Kernel": c.kernel_type.upper(),
            "Type": self.test_type.upper()[:3],
            "Batch": c.batch_size,
            "Heads": c.num_heads,
            "SeqLen": c.seq_len,
            "HeadDim": c.head_dim,
            "Status": "PASS" if self.passed else "FAIL",
            "MaxError": self.max_abs_error,
            "MaxErrorSDPA": self.max_abs_error_sdpa,
            "MeanError": self.mean_abs_error,
            "MSE": self.mse,
            "MaxRelError": self.max_rel_error,
            "KernelTime_ms": self.kernel_time_ms,
            "TorchTime_ms": self.oracle_time_ms,
            "Speedup": self.speedup,
            "TFLOPS": self.tflops,
            "Bandwidth_GBps": self.bandwidth_gbps,
            "ErrorMessage": self.error_message,
        }


def _make_qkv(cfg: TestConfig):
    """Seeded uniform Q/K/V — parity with the harness's torch.rand(seed=42)
    fixtures (test_flash_attention2.py:177-195)."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(cfg.seed), 3)
    shape = (cfg.batch_size, cfg.num_heads, cfg.seq_len, cfg.head_dim)
    q = jax.random.uniform(k1, shape, jnp.float32)
    k = jax.random.uniform(k2, shape, jnp.float32)
    v = jax.random.uniform(k3, shape, jnp.float32)
    return q, k, v


class Harness:
    def __init__(self, tolerance: float = 1e-3, stop_on_failure: bool = True,
                 warmup: int = 1, iters: int | None = None, oracle_iters: int = 3,
                 time_oracle: bool = True, verbose: bool = True):
        self.tolerance = tolerance
        self.stop_on_failure = stop_on_failure
        self.warmup = warmup
        self.iters = iters
        # Forwarded to every device_benchmark call; iters=None keeps the
        # timer's own adaptive default.
        self._bench_kw = {"warmup": warmup}
        if iters is not None:
            self._bench_kw["iters"] = iters
        self.oracle_iters = oracle_iters
        self.time_oracle = time_oracle
        self.verbose = verbose
        self.results: list[TestResult] = []

    # -- single-config runs --------------------------------------------------

    def run_forward(self, cfg: TestConfig) -> TestResult:
        q, k, v = _make_qkv(cfg)
        score_bytes = 4 * cfg.batch_size * cfg.num_heads * cfg.seq_len ** 2
        oracle = (
            vanilla_attention_chunked
            if score_bytes > _ORACLE_CHUNK_BYTES else vanilla_attention
        )
        o_ref = oracle(q, k, v)
        fn = jax.jit(
            lambda q, k, v: run_flash_attention(
                cfg.kernel_type, "forward", cfg.precision, q, k, v
            )["o"]
        )
        o = fn(q, k, v)
        m = compute_metrics(o, o_ref)
        # Second-oracle gate (skip where SDPA would materialize a huge S^2).
        err_sdpa = float("nan")
        sdpa_ok = True
        if score_bytes <= _ORACLE_CHUNK_BYTES:
            m2 = compute_metrics(o, sdpa_attention(q, k, v))
            err_sdpa = m2.max_abs_error
            sdpa_ok = m2.passes(cfg.tolerance)
        t = device_benchmark(fn, q, k, v, **self._bench_kw)
        t_oracle = (
            device_benchmark(jax.jit(oracle), q, k, v, warmup=1)
            if self.time_oracle else float("nan")
        )
        flops = attention_flops(
            cfg.batch_size, cfg.num_heads, cfg.seq_len, cfg.seq_len,
            cfg.head_dim, mode="forward",
        )
        nbytes = attention_io_bytes(
            cfg.batch_size, cfg.num_heads, cfg.seq_len, cfg.seq_len, cfg.head_dim
        )
        return TestResult(
            config=cfg, test_type="forward",
            passed=m.passes(cfg.tolerance) and sdpa_ok,
            max_abs_error=m.max_abs_error, mean_abs_error=m.mean_abs_error,
            mse=m.mse, max_rel_error=m.max_rel_error,
            max_abs_error_sdpa=err_sdpa,
            kernel_time_ms=1e3 * t, oracle_time_ms=1e3 * t_oracle,
            speedup=t_oracle / t if t > 0 else float("nan"),
            tflops=flops / t / 1e12, bandwidth_gbps=nbytes / t / 1e9,
        )

    def run_backward(self, cfg: TestConfig) -> TestResult:
        """Backward-only: forward artifacts come from the ORACLE, not the
        kernel (reference quirk, test_flash_attention2.py:917-922)."""
        q, k, v = _make_qkv(cfg)
        score_bytes = 4 * cfg.batch_size * cfg.num_heads * cfg.seq_len ** 2
        chunked = score_bytes > _ORACLE_CHUNK_BYTES
        if chunked:
            # Long context: Q-chunked forward artifacts + the checkpointed
            # chunked gradient oracle (full S x S would not fit HBM).
            o_ref, lse_ref = vanilla_attention_chunked(
                q, k, v, return_lse=True
            )
        else:
            o_ref, lse_ref = vanilla_attention_with_lse(q, k, v)
        fn = jax.jit(
            lambda q, k, v, o, lse: run_flash_attention(
                cfg.kernel_type, "backward", cfg.precision, q, k, v,
                o=o, lse=lse,
            )
        )
        grads = fn(q, k, v, o_ref, lse_ref)
        dq_ref, dk_ref, dv_ref = reference_attention_grads(
            q, k, v, chunked=chunked
        )
        got = np.concatenate(
            [np.asarray(grads[n]).ravel() for n in ("dq", "dk", "dv")]
        )
        ref = np.concatenate(
            [np.asarray(x).ravel() for x in (dq_ref, dk_ref, dv_ref)]
        )
        m = compute_metrics(got, ref)
        if chunked:
            m2 = m  # SDPA comparator would materialize the S^2 buffer
        else:
            ref2 = np.concatenate(
                [np.asarray(x).ravel() for x in sdpa_attention_grads(q, k, v)]
            )
            m2 = compute_metrics(got, ref2)
        t = device_benchmark(fn, q, k, v, o_ref, lse_ref, **self._bench_kw)
        t_oracle = (
            device_benchmark(
                jax.jit(
                    lambda q, k, v: reference_attention_grads(
                        q, k, v, chunked=chunked
                    )
                ),
                q, k, v, warmup=1,
            )
            if self.time_oracle else float("nan")
        )
        flops = attention_flops(
            cfg.batch_size, cfg.num_heads, cfg.seq_len, cfg.seq_len,
            cfg.head_dim, mode="backward",
        )
        nbytes = attention_io_bytes(
            cfg.batch_size, cfg.num_heads, cfg.seq_len, cfg.seq_len, cfg.head_dim
        )
        return TestResult(
            config=cfg, test_type="backward",
            passed=m.passes(cfg.tolerance) and m2.passes(cfg.tolerance),
            max_abs_error=m.max_abs_error, mean_abs_error=m.mean_abs_error,
            mse=m.mse, max_rel_error=m.max_rel_error,
            max_abs_error_sdpa=m2.max_abs_error,
            kernel_time_ms=1e3 * t, oracle_time_ms=1e3 * t_oracle,
            speedup=t_oracle / t if t > 0 else float("nan"),
            tflops=flops / t / 1e12, bandwidth_gbps=nbytes / t / 1e9,
        )

    def run_both(self, cfg: TestConfig) -> TestResult:
        """Both-mode: the kernel forward's (O, logsumexp) feed the kernel
        backward — the end-to-end save-for-backward contract
        (test_flash_attention2.py:608-794)."""
        q, k, v = _make_qkv(cfg)
        fn = jax.jit(
            lambda q, k, v: run_flash_attention(
                cfg.kernel_type, "forward_backward", cfg.precision, q, k, v
            )
        )
        out = fn(q, k, v)
        score_bytes = 4 * cfg.batch_size * cfg.num_heads * cfg.seq_len ** 2
        chunked = score_bytes > _ORACLE_CHUNK_BYTES
        o_ref = (
            vanilla_attention_chunked(q, k, v) if chunked
            else vanilla_attention(q, k, v)
        )
        dq_ref, dk_ref, dv_ref = reference_attention_grads(
            q, k, v, chunked=chunked
        )
        m_fwd = compute_metrics(out["o"], o_ref)
        got = np.concatenate(
            [np.asarray(out[n]).ravel() for n in ("dq", "dk", "dv")]
        )
        ref = np.concatenate(
            [np.asarray(x).ravel() for x in (dq_ref, dk_ref, dv_ref)]
        )
        m_bwd = compute_metrics(got, ref)
        if chunked:
            m2, m2b = m_fwd, m_bwd  # SDPA would materialize the S^2 buffer
        else:
            o_sdpa = sdpa_attention(q, k, v)
            ref2 = np.concatenate(
                [np.asarray(x).ravel() for x in sdpa_attention_grads(q, k, v)]
            )
            m2 = compute_metrics(out["o"], o_sdpa)
            m2b = compute_metrics(got, ref2)
        passed = (
            m_fwd.passes(cfg.tolerance) and m_bwd.passes(cfg.tolerance)
            and m2.passes(cfg.tolerance) and m2b.passes(cfg.tolerance)
        )
        t = device_benchmark(fn, q, k, v, **self._bench_kw)
        flops = attention_flops(
            cfg.batch_size, cfg.num_heads, cfg.seq_len, cfg.seq_len,
            cfg.head_dim, mode="both",  # 3.5x fwd (= fwd + 2.5x fwd, :633-635)
        )
        nbytes = attention_io_bytes(
            cfg.batch_size, cfg.num_heads, cfg.seq_len, cfg.seq_len, cfg.head_dim
        )
        return TestResult(
            config=cfg, test_type="both", passed=passed,
            max_abs_error=max(m_fwd.max_abs_error, m_bwd.max_abs_error),
            mean_abs_error=m_bwd.mean_abs_error, mse=m_bwd.mse,
            max_rel_error=m_bwd.max_rel_error,
            max_abs_error_sdpa=max(m2.max_abs_error, m2b.max_abs_error),
            kernel_time_ms=1e3 * t, oracle_time_ms=float("nan"),
            tflops=flops / t / 1e12, bandwidth_gbps=nbytes / t / 1e9,
        )

    # -- suite runner ---------------------------------------------------------

    def run(self, configs: list[TestConfig]) -> list[TestResult]:
        runners = {
            "forward": self.run_forward,
            "backward": self.run_backward,
            "both": self.run_both,
        }
        for i, cfg in enumerate(configs):
            t0 = time.time()
            try:
                result = runners[cfg.test_mode](cfg)
            except Exception as e:  # noqa: BLE001 — match reference behavior
                result = TestResult(
                    config=cfg, test_type=cfg.test_mode, passed=False,
                    error_message=f"{type(e).__name__}: {e}",
                )
            self.results.append(result)
            if self.verbose:
                status = "PASS" if result.passed else "FAIL"
                print(
                    f"[{i + 1}/{len(configs)}] {cfg.name:22s} {cfg.kernel_type:12s} "
                    f"{cfg.test_mode:8s} {status}  "
                    f"err={result.max_abs_error:.2e}  "
                    f"t={result.kernel_time_ms:.3f}ms  "
                    f"({time.time() - t0:.1f}s)"
                    + (f"  !! {result.error_message}" if result.error_message else "")
                )
            if not result.passed and self.stop_on_failure:
                print(f"Stopping on first failure: {cfg.name}")
                break
        return self.results

    # -- reporting ------------------------------------------------------------

    def summary(self) -> str:
        """Tabulated summary grid + per-kernel averages — parity with
        print_summary (test_flash_attention2.py:1289-1362)."""
        rows = [r.as_row() for r in self.results]
        if not rows:
            return "(no results)"
        cols = ["Test", "Kernel", "Type", "Status", "MaxError",
                "KernelTime_ms", "Speedup", "TFLOPS", "Bandwidth_GBps"]
        try:
            from tabulate import tabulate
            table = tabulate(
                [[r[c] for c in cols] for r in rows],
                headers=cols, floatfmt=".4g", tablefmt="grid",
            )
        except ImportError:
            table = "\n".join(",".join(str(r[c]) for c in cols) for r in rows)
        # per-kernel averages
        by_kernel: dict[str, list] = {}
        for r in rows:
            by_kernel.setdefault(r["Kernel"], []).append(r)
        lines = [table, "", "Per-kernel averages:"]
        for kern, rs in by_kernel.items():
            ts = [r["KernelTime_ms"] for r in rs if np.isfinite(r["KernelTime_ms"])]
            tf = [r["TFLOPS"] for r in rs if np.isfinite(r["TFLOPS"])]
            sp = [r["Speedup"] for r in rs if np.isfinite(r["Speedup"])]
            bw = [r["Bandwidth_GBps"] for r in rs if np.isfinite(r["Bandwidth_GBps"])]
            lines.append(
                f"  {kern:14s} mean time {np.mean(ts):8.3f} ms | "
                f"mean TFLOPS {np.mean(tf):6.2f} | "
                f"mean speedup {np.mean(sp) if sp else float('nan'):7.2f}x | "
                f"mean BW {np.mean(bw):7.2f} GB/s | "
                f"{sum(r['Status'] == 'PASS' for r in rs)}/{len(rs)} pass"
            )
        return "\n".join(lines)

    def save_csv(self, path: str) -> None:
        import pandas as pd

        pd.DataFrame([r.as_row() for r in self.results]).to_csv(path, index=False)
