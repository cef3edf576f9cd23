from cuda_flash_attention_tpu.kernels.attention import (  # noqa: F401
    BlockSizes,
    flash_attention,
    flash_attention_with_lse,
)
