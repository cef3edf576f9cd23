from cuda_flash_attention_tpu.models.transformer import (  # noqa: F401
    TransformerConfig,
    init_params,
    init_opt_state,
    forward,
    loss_fn,
    make_train_step,
    gqa_flash_attention,
    param_shardings,
)
