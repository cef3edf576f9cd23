"""CLI + binary IO contract tests (reference src/main.cpp / src/utils.cpp)."""

import os

import numpy as np
import pytest

from cuda_flash_attention_tpu import cli
from cuda_flash_attention_tpu.ops.metrics import compute_metrics
from cuda_flash_attention_tpu.utils.io import (
    data_dir_name,
    load_binary_file,
    parse_config_string,
    save_binary_file,
)


@pytest.mark.quick
def test_parse_config_string():
    assert parse_config_string("data/B2_H8_S512_D64") == (2, 8, 512, 64)
    assert parse_config_string("/x/y/B1_H1_S100_D32/") == (1, 1, 100, 32)
    with pytest.raises(ValueError):
        parse_config_string("data/batch2_h8")


@pytest.mark.quick
def test_binary_roundtrip(tmp_path):
    x = np.random.default_rng(0).standard_normal((2, 3, 4, 5)).astype(np.float32)
    p = tmp_path / "t.bin"
    save_binary_file(str(p), x)
    y = load_binary_file(str(p), x.shape)
    np.testing.assert_array_equal(x, y)
    with pytest.raises(ValueError, match="expected"):
        load_binary_file(str(p), (2, 3, 4, 6))


def _make_data_dir(tmp_path, b=1, h=2, s=128, d=64, seed=3):
    rng = np.random.default_rng(seed)
    ddir = tmp_path / data_dir_name(b, h, s, d)
    os.makedirs(ddir)
    for name in ("Q", "K", "V"):
        save_binary_file(
            str(ddir / f"{name}.bin"),
            rng.standard_normal((b, h, s, d)).astype(np.float32),
        )
    return str(ddir), (b, h, s, d)


def test_cli_forward_then_backward_roundtrip(tmp_path):
    ddir, shape = _make_data_dir(tmp_path)
    cli.run("fa2", "forward", "fp32", ddir)
    assert os.path.exists(os.path.join(ddir, "O.bin"))
    assert os.path.exists(os.path.join(ddir, "logsumexp.bin"))

    # Outputs match the oracle.
    import jax.numpy as jnp

    from cuda_flash_attention_tpu.ops.reference import (
        reference_attention_grads,
        vanilla_attention,
    )

    q = jnp.asarray(load_binary_file(os.path.join(ddir, "Q.bin"), shape))
    k = jnp.asarray(load_binary_file(os.path.join(ddir, "K.bin"), shape))
    v = jnp.asarray(load_binary_file(os.path.join(ddir, "V.bin"), shape))
    o = load_binary_file(os.path.join(ddir, "O.bin"), shape)
    assert compute_metrics(o, vanilla_attention(q, k, v)).passes(1e-3)

    # Backward reloads the persisted artifacts (src/main.cpp:66-81).
    cli.run("fa2", "backward", "fp32", ddir)
    dq = load_binary_file(os.path.join(ddir, "dQ.bin"), shape)
    dq_ref, _, _ = reference_attention_grads(q, k, v)
    assert compute_metrics(dq, dq_ref).passes(1e-3)


def test_cli_backward_requires_artifacts(tmp_path):
    ddir, _ = _make_data_dir(tmp_path, s=128)
    with pytest.raises(FileNotFoundError, match="logsumexp"):
        cli.run("fa2", "backward", "fp32", ddir)


def test_cli_usage_errors():
    assert cli.main([]) == 2
    assert cli.main(["fa9", "forward", "fp32", "/nonexistent"]) == 1


def test_cli_accepts_naive_alias(tmp_path):
    # Reference CLI calls the vanilla kernel "naive" (error_utils.h:17).
    ddir, shape = _make_data_dir(tmp_path, s=64)
    cli.run("naive", "forward", "fp32", ddir)
    assert os.path.exists(os.path.join(ddir, "O.bin"))
