"""Plot generation — parity with _generate_plots / seq-len scaling plots
(/root/reference/test_flash_attention2.py:1127-1287): a 2x2 comparison grid
(time / speedup / TFLOPS / bandwidth per kernel) and log2-x sequence-length
scaling curves."""

from __future__ import annotations

import os


def generate_plots(df, output_dir: str, prefix: str = "") -> list[str]:
    """`prefix` distinguishes artifact sets (e.g. "backward_") so modes
    don't overwrite each other — reference parity: forward and backward
    experiments keep separate committed PNGs/CSVs."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    written = []

    ok = df[df["Status"] == "PASS"]
    if ok.empty:
        return written

    fig, axes = plt.subplots(2, 2, figsize=(14, 10))
    metrics = [
        ("KernelTime_ms", "Kernel time (ms)", True),
        ("Speedup", "Speedup vs oracle", False),
        ("TFLOPS", "TFLOPS", False),
        ("Bandwidth_GBps", "Bandwidth (GB/s)", False),
    ]
    tests = list(dict.fromkeys(ok["Test"]))
    kernels = list(dict.fromkeys(ok["Kernel"]))
    for ax, (col, label, logy) in zip(axes.flat, metrics):
        width = 0.8 / max(len(kernels), 1)
        for j, kern in enumerate(kernels):
            sub = ok[ok["Kernel"] == kern].set_index("Test")
            xs, ys = [], []
            for i, t in enumerate(tests):
                if t in sub.index:
                    xs.append(i + j * width)
                    val = sub.loc[t, col]
                    ys.append(float(val.iloc[0]) if hasattr(val, "iloc") else float(val))
            ax.bar(xs, ys, width=width, label=kern)
        ax.set_xticks(range(len(tests)))
        ax.set_xticklabels(tests, rotation=45, ha="right", fontsize=7)
        ax.set_ylabel(label)
        if logy:
            ax.set_yscale("log")
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
    fig.suptitle("Kernel comparison (TPU)")
    fig.tight_layout()
    path = os.path.join(output_dir, f"{prefix}kernel_comparison.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    written.append(path)

    # Sequence-length scaling (only for SeqLen-* rows), log2 x-axis
    seq = ok[ok["Test"].str.startswith("SeqLen-")]
    if not seq.empty:
        fig, axes = plt.subplots(1, 2, figsize=(12, 4.5))
        for kern in list(dict.fromkeys(seq["Kernel"])):
            sub = seq[seq["Kernel"] == kern].sort_values("SeqLen")
            axes[0].plot(sub["SeqLen"], sub["KernelTime_ms"], "o-", label=kern)
            axes[1].plot(sub["SeqLen"], sub["TFLOPS"], "o-", label=kern)
        for ax, ylab in zip(axes, ["Kernel time (ms)", "TFLOPS"]):
            ax.set_xscale("log", base=2)
            ax.set_xlabel("sequence length")
            ax.set_ylabel(ylab)
            ax.legend(fontsize=8)
            ax.grid(alpha=0.3)
        axes[0].set_yscale("log")
        fig.suptitle("Sequence-length scaling (TPU)")
        fig.tight_layout()
        path = os.path.join(output_dir, f"{prefix}seqlen_scaling.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        written.append(path)

    return written
