"""TPU-native FlashAttention-2 framework.

A brand-new JAX / Pallas / shard_map framework with the capabilities of the
CUDA reference (detker/CUDA-Flash-Attention): a FlashAttention-2 kernel family
(tiled forward with online softmax + logsumexp, full backward with recompute,
reduced-precision tile variants), FA1 / naive / vanilla baseline kernels, a
dispatch layer, binary-file CLI parity, a benchmarking/accuracy harness, and
TPU-first scale-out (mesh sharding, ring attention, paged quantized KV decode).

Reference layer map: SURVEY.md §1; component inventory: SURVEY.md §2.
"""

__version__ = "0.1.0"

from cuda_flash_attention_tpu.kernels.attention import (  # noqa: F401
    BlockSizes,
    flash_attention,
    flash_attention_with_lse,
)
from cuda_flash_attention_tpu.kernels.fa2_forward_quant import (  # noqa: F401
    flash_attention_int8_kv,
    flash_attention_quantized_kv,
)
from cuda_flash_attention_tpu.ops.reference import (  # noqa: F401
    vanilla_attention,
    vanilla_attention_with_lse,
)
