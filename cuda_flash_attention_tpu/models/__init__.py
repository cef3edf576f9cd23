from cuda_flash_attention_tpu.models.transformer import (  # noqa: F401
    TransformerConfig,
    ffn_block,
    init_params,
    init_opt_state,
    forward,
    loss_fn,
    make_train_step,
    gqa_flash_attention,
    param_shardings,
    stack_layer_params,
    stacked_param_shardings,
)
from cuda_flash_attention_tpu.models.moe import (  # noqa: F401
    init_moe_layer,
    moe_ffn,
)
from cuda_flash_attention_tpu.models.pipeline import (  # noqa: F401
    make_pp_loss_fn,
    make_pp_train_step,
    pipeline_param_shardings,
    stack_pipeline_params,
)
from cuda_flash_attention_tpu.models.lora import (  # noqa: F401
    LoRATensor,
    apply_lora,
    lora_trainable_mask,
    make_lora_optimizer,
    merge_lora,
)
from cuda_flash_attention_tpu.models.training import (  # noqa: F401
    TrainState,
    init_train_state,
    make_optax_train_step,
    make_optimizer,
    train_loop,
)
