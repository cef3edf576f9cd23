"""Harness smoke tests: the bench Tester's three modes end-to-end on one
tiny config, including the long-context (chunked-oracle) branches forced
via the score-bytes threshold — so the S=32k paths are exercised in CI
without a 32k compile."""

import jax.numpy as jnp
import pytest

from cuda_flash_attention_tpu.bench import harness as H
from cuda_flash_attention_tpu.bench.configs import TestConfig


def _cfg(mode):
    return TestConfig(
        name=f"Smoke-{mode}", batch_size=1, num_heads=2, seq_len=256,
        head_dim=64, kernel_type="fa2", test_mode=mode, precision="fp32",
        tolerance=1e-3,
    )


@pytest.mark.quick
@pytest.mark.parametrize("mode", ["forward", "backward", "both"])
def test_harness_modes_pass(mode):
    t = H.Harness(time_oracle=False, verbose=False)
    r = t.run([_cfg(mode)])[0]
    assert r.passed, r.error_message


@pytest.mark.parametrize("mode", ["forward", "backward", "both"])
def test_harness_chunked_oracle_branch(mode, monkeypatch):
    """Force the long-context oracle selection (chunked forward artifacts,
    checkpointed chunked gradient oracle, SDPA comparator skipped) at a
    tiny shape by zeroing the threshold."""
    monkeypatch.setattr(H, "_ORACLE_CHUNK_BYTES", 0)
    t = H.Harness(time_oracle=False, verbose=False)
    r = t.run([_cfg(mode)])[0]
    assert r.passed, r.error_message
