"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The reference has no distributed layer (SURVEY.md §2); these exercise the
new TPU-first components: DP/TP head-parallel attention and ring attention
(sequence parallel) — the shardings the driver also dry-runs via
__graft_entry__.dryrun_multichip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.ops.metrics import compute_metrics
from cuda_flash_attention_tpu.ops.reference import vanilla_attention
from cuda_flash_attention_tpu.parallel import (
    head_parallel_attention,
    make_device_mesh,
    ring_attention,
    shard_qkv,
)
from cuda_flash_attention_tpu.parallel.mesh import cpu_test_mesh

cpu_count = len(jax.devices("cpu"))
needs8 = pytest.mark.skipif(cpu_count < 8, reason="needs 8 virtual CPU devices")


def make_qkv(b, h, s, d, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (b, h, s, d), jnp.float32) for k in ks)


@needs8
def test_head_parallel_matches_single_device():
    mesh = cpu_test_mesh({"data": 2, "model": 4})
    q, k, v = make_qkv(4, 8, 256, 64)
    ref = vanilla_attention(q, k, v)
    qs, ks, vs = shard_qkv(mesh, q, k, v)
    o = head_parallel_attention(mesh, qs, ks, vs)
    m = compute_metrics(o, ref)
    assert m.passes(1e-3) and m.max_abs_error < 2e-5, m


@needs8
@pytest.mark.slow
def test_head_parallel_grads():
    mesh = cpu_test_mesh({"data": 2, "model": 4})
    q, k, v = make_qkv(2, 4, 128, 64, seed=3)
    qs, ks, vs = shard_qkv(mesh, q, k, v)

    def loss(q, k, v):
        return jnp.sum(head_parallel_attention(mesh, q, k, v, causal=True))

    g = jax.grad(loss, argnums=(0, 1, 2))(qs, ks, vs)
    from cuda_flash_attention_tpu.ops.reference import reference_attention_grads

    gr = reference_attention_grads(q, k, v, causal=True)
    for got, ref in zip(g, gr):
        assert compute_metrics(got, ref).passes(1e-3)


@needs8
@pytest.mark.parametrize("causal", [
    pytest.param(False, marks=pytest.mark.slow, id="full"),
    pytest.param(True, id="causal"),
])
def test_ring_attention_matches_oracle(causal):
    mesh = cpu_test_mesh({"ctx": 4})
    q, k, v = make_qkv(1, 2, 512, 64, seed=1)
    ref = vanilla_attention(q, k, v, causal=causal)
    o = ring_attention(mesh, q, k, v, causal=causal)
    m = compute_metrics(np.asarray(o), ref)
    assert m.passes(1e-3) and m.max_abs_error < 2e-5, m


@needs8
@pytest.mark.slow
def test_ring_attention_2d_mesh_with_heads():
    # ctx x model 2D parallelism: 4-way sequence, 2-way heads.
    mesh = cpu_test_mesh({"model": 2, "ctx": 4})
    q, k, v = make_qkv(1, 4, 512, 64, seed=2)
    ref = vanilla_attention(q, k, v, causal=True)
    o = ring_attention(mesh, q, k, v, causal=True)
    assert compute_metrics(np.asarray(o), ref).passes(1e-3)


@needs8
@pytest.mark.slow
def test_ring_attention_differentiable():
    mesh = cpu_test_mesh({"ctx": 4})
    q, k, v = make_qkv(1, 2, 256, 64, seed=4)

    def loss(q, k, v):
        return jnp.sum(ring_attention(mesh, q, k, v, causal=True))

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    from cuda_flash_attention_tpu.ops.reference import reference_attention_grads

    gr = reference_attention_grads(q, k, v, causal=True)
    for name, got, ref in zip("qkv", g, gr):
        m = compute_metrics(np.asarray(got), ref)
        assert m.passes(1e-3), f"d{name}: {m}"
