"""Native (C++) vs Python token loader: bit-identical sampling, correct
windows, and an end-to-end train smoke through the loader."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from cuda_flash_attention_tpu.utils.data import (
    TokenLoader,
    write_token_file,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "cpp", "build", "libcfa_loader.so")


def _build_lib():
    if os.path.exists(LIB):
        return
    if shutil.which("cmake") is None or shutil.which("ninja") is None:
        pytest.skip("no cmake/ninja to build the native loader")
    subprocess.run(
        ["cmake", "-S", os.path.join(REPO, "cpp"), "-B",
         os.path.join(REPO, "cpp", "build"), "-G", "Ninja"],
        check=True, capture_output=True,
    )
    subprocess.run(
        ["ninja", "-C", os.path.join(REPO, "cpp", "build"), "cfa_loader"],
        check=True, capture_output=True,
    )


def _shard(tmp_path, n=5000, seed=0, vocab=32000):
    path = str(tmp_path / "tokens.bin")
    write_token_file(path, np.random.default_rng(seed).integers(
        0, vocab, size=n, dtype=np.int32))
    return path


def test_python_loader_windows(tmp_path):
    path = _shard(tmp_path)
    tokens = np.fromfile(path, dtype="<i4")
    with TokenLoader(path, batch=4, seq_len=63, seed=7,
                     native=False) as it:
        batch = next(it)
    assert batch.shape == (4, 64) and batch.dtype == np.int32
    # Every row is a contiguous window of the shard.
    for row in batch:
        starts = np.where(tokens == row[0])[0]
        assert any(
            np.array_equal(tokens[s:s + 64], row) for s in starts
        )


def test_sequential_mode_wraps(tmp_path):
    path = _shard(tmp_path, n=300)
    with TokenLoader(path, batch=2, seq_len=99, seed=1, shuffle=False,
                     native=False) as it:
        tokens = np.fromfile(path, dtype="<i4")
        b = next(it)
        np.testing.assert_array_equal(b[0], tokens[0:100])
        np.testing.assert_array_equal(b[1], tokens[100:200])
        b2 = next(it)
        np.testing.assert_array_equal(b2[0], tokens[200:300])  # last window
        np.testing.assert_array_equal(b2[1], tokens[0:100])    # wrapped


@pytest.mark.slow
def test_native_matches_python(tmp_path):
    _build_lib()
    path = _shard(tmp_path)
    with TokenLoader(path, batch=8, seq_len=127, seed=42,
                     native=True) as nat, \
         TokenLoader(path, batch=8, seq_len=127, seed=42,
                     native=False) as py:
        assert nat.native and not py.native
        for _ in range(5):
            np.testing.assert_array_equal(next(nat), next(py))


@pytest.mark.slow
def test_train_loop_through_loader(tmp_path):
    import jax

    from cuda_flash_attention_tpu.models import TransformerConfig
    from cuda_flash_attention_tpu.models.training import train_loop

    cfg = TransformerConfig.tiny()
    path = _shard(tmp_path, n=10_000, vocab=cfg.vocab_size)
    with TokenLoader(path, batch=2, seq_len=128, seed=3,
                     native=False) as it:
        state = train_loop(cfg, it, num_steps=2, log_every=0)
    assert int(state.step) == 2
    assert all(
        bool(jax.numpy.isfinite(x).all())
        for x in jax.tree.leaves(state.params)
    )
