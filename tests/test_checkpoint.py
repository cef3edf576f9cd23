"""Checkpoint/resume tests: orbax train-state round trip and resumed
training continuity (the engine-level analog of the reference's
O.bin/logsumexp.bin forward-artifact reload, src/main.cpp:66-81)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.models import (
    TransformerConfig,
    init_opt_state,
    init_params,
    make_train_step,
)
from cuda_flash_attention_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg = TransformerConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = init_opt_state(params)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params, opt, step=17)
    state = restore_checkpoint(path)
    assert int(state["step"]) == 17
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_training_continuity(tmp_path):
    """Train 2 steps; checkpoint after step 1; resuming from the checkpoint
    and taking step 2 must reproduce the uninterrupted run bit-for-bit
    (determinism the reference's atomicAdd backward cannot give,
    SURVEY.md §5 race-detection note)."""
    cfg = TransformerConfig.tiny()
    step_fn = jax.jit(make_train_step(cfg))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 129), 0, cfg.vocab_size)

    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = init_opt_state(params)
    params1, opt1, loss1 = step_fn(params, opt, tokens)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params1, opt1, step=1)
    params2, opt2, loss2 = step_fn(params1, opt1, tokens)

    state = restore_checkpoint(path)
    params2r, opt2r, loss2r = step_fn(state["params"], state["opt_state"], tokens)
    assert float(loss2r) == float(loss2)
    for a, b in zip(jax.tree.leaves(params2), jax.tree.leaves(params2r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
