from cuda_flash_attention_tpu.parallel.mesh import make_device_mesh  # noqa: F401
from cuda_flash_attention_tpu.parallel.sharded import (  # noqa: F401
    head_parallel_attention,
    shard_qkv,
)
from cuda_flash_attention_tpu.parallel.ring import (  # noqa: F401
    ring_attention,
    ring_attention_quantized,
)
from cuda_flash_attention_tpu.parallel.distributed import (  # noqa: F401
    initialize_distributed,
    make_hybrid_mesh,
    two_host_serving_mesh,
)
