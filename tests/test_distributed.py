"""Multi-host scaffolding tests on the virtual CPU fabric (SURVEY.md §4:
multi-host paths must be exercisable without a pod)."""

import jax
import pytest

from cuda_flash_attention_tpu.parallel.distributed import (
    initialize_distributed,
    make_hybrid_mesh,
    scaling_efficiency_bench,
    two_host_serving_mesh,
)

cpu_count = len(jax.devices("cpu"))
needs8 = pytest.mark.skipif(cpu_count < 8, reason="needs 8 virtual CPU devices")


def test_initialize_distributed_single_process_noop():
    # No coordinator configured -> returns False and leaves JAX usable.
    assert initialize_distributed() is False
    assert len(jax.devices()) >= 1


@needs8
@pytest.mark.quick
def test_hybrid_mesh_single_process_fallback():
    devices = jax.devices("cpu")[:8]
    mesh = make_hybrid_mesh(
        {"data": 2, "model": 2}, {"data": 2}, devices=devices
    )
    assert dict(mesh.shape) == {"data": 4, "model": 2}


@needs8
@pytest.mark.quick
def test_two_host_serving_mesh_virtual():
    devices = jax.devices("cpu")[:8]
    mesh = two_host_serving_mesh(4, devices=devices)
    # 1 (virtual) host x 8 devices: data = 8/4, model = 4.
    assert dict(mesh.shape) == {"data": 2, "model": 4}


def test_two_host_serving_mesh_bad_tp():
    devices = jax.devices("cpu")
    with pytest.raises(ValueError):
        two_host_serving_mesh(len(devices) + 1, devices=devices)


@needs8
@pytest.mark.slow
def test_scaling_bench_layouts_execute():
    out = scaling_efficiency_bench(8, batch=8, seq=256, steps=1)
    assert set(out) == {"dp8", "dp4_tp2", "ctx8"}
    for r in out.values():
        # Virtual CPU mesh: compile-proof fields only (timings would be
        # emulated-collective wall clocks masquerading as scaling numbers).
        assert r["loss_finite"] and r["virtual_cpu"]
        assert "tokens_per_sec" not in r
