"""Per-kernel device-time profiling and roofline/MFU accounting.

TPU analog of the reference's CUDA-event kernel timing
(/root/reference/include/timer.h:31-76, test_flash_attention2.py:293-308):
``jax.profiler.trace`` captures an XSpace with one event per XLA op on the
device's "XLA Ops" line; we aggregate durations per op so a fused program
(e.g. D-preamble + backward kernel + dq-partial sum) is broken down into its
actual on-device kernels — wall clocks and dispatch latency never enter.

Roofline: ``roofline_time`` models min(compute, memory) time for a kernel
given its FLOPs, transcendentals, and HBM bytes, derating the MXU for
contractions narrower than the 128-lane systolic array (D=64 fills half the
array => 50% attainable peak). ``mfu`` is measured FLOPs/s over the chip's
absolute peak — reported alongside the derated utilization so the D=64
penalty is visible, not hidden.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import re
import tempfile

import jax

# ---------------------------------------------------------------------------
# Chip peak table (bf16 dense TFLOPS, HBM GB/s). fp32 on TPU runs through the
# MXU's multi-pass emulation at roughly 1/8 the bf16 rate (v5e has no native
# fp32 systolic path); the VPU does ~4 transcendental-capable lanes per ALU
# slot — exp costs multiple VPU ops, folded into `vpu_exp_per_s`.
# ---------------------------------------------------------------------------

_CHIP_PEAKS = {
    # name fragments -> (bf16 TFLOP/s, HBM GB/s, approx exp/s)
    "v5 lite": (197.0, 819.0, 4.0e11),
    "v5e": (197.0, 819.0, 4.0e11),
    "v5p": (459.0, 2765.0, 9.0e11),
    "v4": (275.0, 1228.0, 5.5e11),
    "v6 lite": (918.0, 1640.0, 8.0e11),
    "v6e": (918.0, 1640.0, 8.0e11),
}


@dataclasses.dataclass(frozen=True)
class ChipPeaks:
    name: str
    bf16_tflops: float
    hbm_gbps: float
    exp_per_s: float


def chip_peaks(device=None) -> ChipPeaks:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "") or ""
    low = kind.lower()
    for frag, (tf, bw, ex) in _CHIP_PEAKS.items():
        if frag in low:
            return ChipPeaks(kind, tf, bw, ex)
    # Unknown chip (e.g. the CPU test backend): v5e numbers as placeholders.
    return ChipPeaks(kind or "unknown", 197.0, 819.0, 4.0e11)


# ---------------------------------------------------------------------------
# Trace capture + XLA-op aggregation.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class OpTime:
    name: str
    count: int
    total_ms: float

    @property
    def mean_ms(self) -> float:
        return self.total_ms / max(self.count, 1)


def _parse_xspace(logdir: str) -> list[OpTime]:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # lazy: heavy

    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not files:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(max(files, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())
    agg: dict[str, OpTime] = {}
    for plane in xs.planes:
        if "/device:TPU" not in plane.name and "/device:tpu" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                ot = agg.setdefault(name, OpTime(name, 0, 0.0))
                ot.count += 1
                ot.total_ms += ev.duration_ps / 1e9
    return sorted(agg.values(), key=lambda o: -o.total_ms)


def profile_ops(fn, *args, iters: int = 4, warmup: int = 2,
                logdir: str | None = None) -> list[OpTime]:
    """Run `fn(*args)` under jax.profiler.trace and return per-XLA-op device
    times aggregated over `iters` calls (descending total)."""
    fn = jax.jit(fn)
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    logdir = logdir or tempfile.mkdtemp(prefix="cfa_trace_")
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    return _parse_xspace(logdir)


def kernel_device_time(fn, *args, match: str | None = None, iters: int = 4,
                       exclude_copies: bool = True) -> float:
    """Mean per-call DEVICE seconds summed over the profiled XLA ops.

    `match` (regex) restricts to ops whose name matches (e.g. the Pallas
    kernel's HLO name); by default all ops except layout copies count — the
    per-kernel analog of the reference's bracketed TimerGPU regions."""
    ops = profile_ops(fn, *args, iters=iters)
    total_ms = 0.0
    for op in ops:
        if match is not None and not re.search(match, op.name):
            continue
        if match is None and exclude_copies and re.match(
            r"%?(copy|bitcast|tuple|fusion\.\d+ = \(\))", op.name
        ):
            continue
        total_ms += op.total_ms
    return total_ms / 1e3 / iters


# ---------------------------------------------------------------------------
# Roofline model.
# ---------------------------------------------------------------------------


def mxu_derate(contract_dim: int, out_lanes: int | None = None) -> float:
    """Attainable fraction of MXU peak for a matmul whose contraction (or
    output lane) dimension underfills the 128-wide systolic array."""
    frac = min(contract_dim, 128) / 128.0
    if out_lanes is not None:
        frac = min(frac, min(out_lanes, 128) / 128.0)
    return frac


def roofline_time(
    flops: float,
    hbm_bytes: float,
    *,
    transcendentals: float = 0.0,
    derate: float = 1.0,
    peaks: ChipPeaks | None = None,
) -> dict:
    """Speed-of-light time (s) for a kernel: max of the compute and memory
    rooflines, with the MXU derated by `derate` (e.g. 0.5 for D=64) and exp
    throughput modeled separately (the VPU runs concurrently with the MXU,
    so transcendental time overlaps compute but bounds it from below)."""
    p = peaks or chip_peaks()
    t_mxu = flops / (p.bf16_tflops * 1e12 * derate)
    t_hbm = hbm_bytes / (p.hbm_gbps * 1e9)
    t_vpu = transcendentals / p.exp_per_s
    return {
        "t_ideal_s": max(t_mxu, t_hbm, t_vpu),
        "t_mxu_s": t_mxu,
        "t_hbm_s": t_hbm,
        "t_vpu_s": t_vpu,
        "bound": max(
            (("mxu", t_mxu), ("hbm", t_hbm), ("vpu", t_vpu)),
            key=lambda kv: kv[1],
        )[0],
    }


def mfu(flops: float, seconds: float, *, derate: float = 1.0,
        peaks: ChipPeaks | None = None) -> dict:
    """Measured-FLOPs utilization: absolute (vs chip bf16 peak) AND derated
    (vs the D-limited attainable peak) so narrow-head penalties are explicit."""
    p = peaks or chip_peaks()
    tflops = flops / seconds / 1e12
    return {
        "tflops": tflops,
        "mfu": tflops / p.bf16_tflops,
        "mfu_derated": tflops / (p.bf16_tflops * derate),
        "peak_tflops": p.bf16_tflops,
        "chip": p.name,
    }
