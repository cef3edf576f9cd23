"""Baseline kernels (FA1, naive-FA2) and the dispatch registry."""

import jax
import jax.numpy as jnp
import pytest

from cuda_flash_attention_tpu.dispatch import (
    ComputeDataType,
    ComputeType,
    ModeType,
    run_flash_attention,
)
from cuda_flash_attention_tpu.kernels.baselines import (
    fa1_attention,
    naive_fa2_attention,
)
from cuda_flash_attention_tpu.ops.metrics import compute_metrics
from cuda_flash_attention_tpu.ops.reference import (
    reference_attention_grads,
    vanilla_attention,
)


def make_qkv(b, h, s, d, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.uniform(k, (b, h, s, d), jnp.float32) for k in ks)


@pytest.mark.parametrize("s", [
    pytest.param(128, marks=pytest.mark.slow, id="s128"),  # 280 s interpreted
    pytest.param(256, id="s256"),
    pytest.param(100, id="s100"),
])
def test_fa1_matches_oracle(s):
    q, k, v = make_qkv(1, 2, s, 64)
    o = fa1_attention(q, k, v)
    m = compute_metrics(o, vanilla_attention(q, k, v))
    assert m.passes(1e-3) and m.max_abs_error < 2e-6, m


@pytest.mark.parametrize("s", [128, 512, 100], ids=["s128", "s512", "s100"])
def test_naive_fa2_matches_oracle(s):
    q, k, v = make_qkv(1, 2, s, 64)
    o = naive_fa2_attention(q, k, v)
    m = compute_metrics(o, vanilla_attention(q, k, v))
    assert m.passes(1e-3) and m.max_abs_error < 2e-6, m


def test_dispatch_forward_all_methods():
    q, k, v = make_qkv(1, 2, 128, 64)
    ref = vanilla_attention(q, k, v)
    for method in ["vanilla", "fa1", "fa2-naive", "fa2"]:
        out = run_flash_attention(method, "forward", "fp32", q, k, v)
        m = compute_metrics(out["o"], ref)
        assert m.passes(1e-3), f"{method}: {m}"
    # fa2 also returns the logsumexp artifact; fa1/naive do not (parity).
    assert run_flash_attention("fa2", "forward", "fp32", q, k, v)["lse"] is not None
    assert run_flash_attention("fa1", "forward", "fp32", q, k, v)["lse"] is None


def test_dispatch_rejects_invalid_combos():
    # Parity with dispatcher.h:32-35, 74-83 rejection rules.
    q, k, v = make_qkv(1, 1, 128, 64)
    with pytest.raises(ValueError, match="forward"):
        run_flash_attention("fa1", "backward", "fp32", q, k, v)
    with pytest.raises(ValueError, match="fp32"):
        run_flash_attention("fa2-naive", "forward", "fp16", q, k, v)
    bad = jnp.zeros((1, 1, 128, 48))
    with pytest.raises(ValueError, match="head_dim"):
        run_flash_attention("fa2", "forward", "fp32", bad, bad, bad)
    with pytest.raises(ValueError, match="unknown method"):
        ComputeType.parse("fa3")


def test_dispatch_mode_spelling_quirk_fixed():
    # The reference README documents "forward-backward" but its parser only
    # accepts "forward_backward" (README.md:148 vs src/utils.cpp:82) — we
    # accept both.
    assert ModeType.parse("forward-backward") == ModeType.FORWARD_BACKWARD
    assert ModeType.parse("forward_backward") == ModeType.FORWARD_BACKWARD


def test_dispatch_forward_backward_roundtrip():
    q, k, v = make_qkv(1, 2, 256, 64, seed=5)
    out = run_flash_attention("fa2", "forward_backward", "fp32", q, k, v)
    dq_ref, dk_ref, dv_ref = reference_attention_grads(q, k, v)
    assert compute_metrics(out["dq"], dq_ref).passes(1e-3)
    assert compute_metrics(out["dk"], dk_ref).passes(1e-3)
    assert compute_metrics(out["dv"], dv_ref).passes(1e-3)


def test_dispatch_backward_mode_requires_artifacts():
    q, k, v = make_qkv(1, 1, 128, 64)
    with pytest.raises(ValueError, match="forward artifacts"):
        run_flash_attention("fa2", "backward", "fp32", q, k, v)
