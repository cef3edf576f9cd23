"""Serving layer: paged quantized KV cache, flash-decoding kernel,
continuous-batching engine (SURVEY.md §7.9)."""

from cuda_flash_attention_tpu.decode.attention import (
    paged_chunk_attention,
    paged_decode_attention,
)
from cuda_flash_attention_tpu.decode.engine import DecodeEngine, Request
from cuda_flash_attention_tpu.decode.kv_cache import (
    KVPages,
    PageAllocator,
    append_chunk_kv,
    append_token_kv,
    init_kv_pages,
    init_kv_pages_stacked,
    write_prompt_kv,
    write_prompt_kv_stacked,
)
from cuda_flash_attention_tpu.decode.model import (
    decode_step,
    prefill_forward,
    verify_step,
)
from cuda_flash_attention_tpu.decode.sampling import sample_tokens
from cuda_flash_attention_tpu.decode.sharded import (
    shard_kv_pages,
    tp_chunk_append_attend,
    tp_paged_decode_attention,
)

__all__ = [
    "paged_chunk_attention",
    "paged_decode_attention",
    "DecodeEngine",
    "Request",
    "KVPages",
    "PageAllocator",
    "append_chunk_kv",
    "append_token_kv",
    "init_kv_pages",
    "init_kv_pages_stacked",
    "write_prompt_kv",
    "write_prompt_kv_stacked",
    "decode_step",
    "prefill_forward",
    "verify_step",
    "sample_tokens",
    "shard_kv_pages",
    "tp_chunk_append_attend",
    "tp_paged_decode_attention",
]
