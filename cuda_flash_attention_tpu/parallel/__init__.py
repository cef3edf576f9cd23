from cuda_flash_attention_tpu.parallel.mesh import make_device_mesh  # noqa: F401
from cuda_flash_attention_tpu.parallel.sharded import (  # noqa: F401
    head_parallel_attention,
    shard_qkv,
)
from cuda_flash_attention_tpu.parallel.ring import ring_attention  # noqa: F401
