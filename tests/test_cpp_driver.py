"""End-to-end test of the native C++ CLI driver (cpp/main.cpp): builds (or
reuses) the binary, runs the forward contract on a .bin data dir, and checks
the persisted artifacts — the reference's L3 layer exercised as a black box."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(REPO, "cpp", "build", "FlashAttention")


def _binary():
    if os.path.exists(BIN):
        return BIN
    if shutil.which("cmake") is None or shutil.which("ninja") is None:
        pytest.skip("no cmake/ninja to build the native driver")
    subprocess.run(
        ["cmake", "-S", os.path.join(REPO, "cpp"), "-B",
         os.path.join(REPO, "cpp", "build"), "-G", "Ninja"],
        check=True, capture_output=True,
    )
    subprocess.run(
        ["ninja", "-C", os.path.join(REPO, "cpp", "build")],
        check=True, capture_output=True,
    )
    return BIN


@pytest.mark.slow
def test_cpp_driver_forward(tmp_path):
    binary = _binary()
    b, h, s, d = 1, 2, 128, 64
    ddir = tmp_path / f"B{b}_H{h}_S{s}_D{d}"
    os.makedirs(ddir)
    rng = np.random.default_rng(0)
    tensors = {}
    for name in ("Q", "K", "V"):
        x = rng.standard_normal((b, h, s, d)).astype(np.float32)
        x.tofile(str(ddir / f"{name}.bin"))
        tensors[name] = x

    env = dict(os.environ, CFA_PYTHON=sys.executable,
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [binary, "fa2", "forward", "fp32", str(ddir)],
        capture_output=True, text=True, env=env, timeout=540,
    )
    assert proc.returncode == 0, proc.stderr + proc.stdout
    o = np.fromfile(str(ddir / "O.bin"), np.float32).reshape(b, h, s, d)
    lse = np.fromfile(str(ddir / "logsumexp.bin"), np.float32)
    assert lse.size == b * h * s
    assert np.isfinite(o).all() and np.isfinite(lse).all()

    # Oracle check through the public package.
    import jax.numpy as jnp

    from cuda_flash_attention_tpu.ops.reference import vanilla_attention

    o_ref = vanilla_attention(
        jnp.asarray(tensors["Q"]), jnp.asarray(tensors["K"]),
        jnp.asarray(tensors["V"]),
    )
    assert float(np.max(np.abs(o - np.asarray(o_ref)))) < 1e-3


def test_cpp_driver_usage_error():
    binary = _binary()
    proc = subprocess.run([binary], capture_output=True, text=True)
    assert proc.returncode != 0
    assert "Usage" in proc.stderr
