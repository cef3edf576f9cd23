from cuda_flash_attention_tpu.dispatch.types import (  # noqa: F401
    ComputeDataType,
    ComputeType,
    ModeType,
)
from cuda_flash_attention_tpu.dispatch.registry import (  # noqa: F401
    run_flash_attention,
    get_kernel,
    SUPPORTED_HEAD_DIMS,
)
