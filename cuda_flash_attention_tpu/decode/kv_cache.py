"""Paged KV cache: fixed-size pages, host-side page allocator, quantized
storage (SURVEY.md §7.9 "paged INT8 KV cache").

The reference has no serving layer at all (SURVEY.md §2 — kernel library
only); this is the TPU-first design the north star requires:

  * K/V live in HBM as [n_kv_heads, num_pages, page_size, head_dim] pages of
    int8 (or fp8 / bf16 / fp32) with per-token fp32 scales
    [n_kv_heads, num_pages, page_size] when quantized.
  * A page table [max_seqs, pages_per_seq] of page ids maps each sequence
    slot's logical blocks to physical pages — sequences grow without copying
    and freed pages are reused immediately (continuous batching).
  * The page allocator is HOST state (a free list): allocation happens
    between jitted steps when requests are admitted/evicted; the device only
    ever sees dense int32 tables, so every kernel stays static-shaped.

Writes are functional scatters (`.at[...].set`) so the cache is a plain
pytree that flows through jit; XLA turns the per-step single-token append
into an in-place dynamic-update-slice.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cuda_flash_attention_tpu.quant.qtensor import qmax_for

_FLOAT_CACHE_DTYPES = (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))


def _is_quantized(dtype) -> bool:
    return jnp.dtype(dtype) not in _FLOAT_CACHE_DTYPES


def _resolve_cache_dtype(dtype, head_dim):
    """Map a cache dtype (incl. the "int4" string) to
    (storage_dtype, stored_width, packed).  INT4 packs two 4-bit values
    per int8 byte in SPLIT-HALF layout: byte lane j holds k[j] in the low
    nibble and k[j + head_dim//2] in the high nibble, so the kernel-side
    unpack is two integer ops plus ONE lane-concat that restores the
    exact element order (no interleave)."""
    if isinstance(dtype, str) and dtype == "int4":
        if head_dim % 2:
            raise ValueError(f"int4 KV needs an even head_dim; {head_dim}")
        return jnp.int8, head_dim // 2, True
    return dtype, head_dim, False


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class KVPages:
    """One layer's paged K/V storage. scales are all-ones when the cache
    dtype is a float type (uniform kernel path, zero branching)."""

    k_pages: jax.Array   # [n_kv_heads, num_pages, page_size, head_dim]
    k_scales: jax.Array  # [n_kv_heads, num_pages, page_size] f32
    v_pages: jax.Array
    v_scales: jax.Array

    def tree_flatten(self):
        return (self.k_pages, self.k_scales, self.v_pages, self.v_scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # Negative indices so both layouts work: per-layer [Hkv, P, page, D]
    # and layer-stacked [L, Hkv, P, page, D] (init_kv_pages_stacked).
    @property
    def page_size(self) -> int:
        return self.k_pages.shape[-2]

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[-3]

    @property
    def stacked(self) -> bool:
        return self.k_pages.ndim == 5


def init_kv_pages(
    n_kv_heads: int,
    num_pages: int,
    page_size: int,
    head_dim: int,
    dtype=jnp.int8,
) -> KVPages:
    dtype, head_dim, _ = _resolve_cache_dtype(dtype, head_dim)
    shape = (n_kv_heads, num_pages, page_size, head_dim)
    sshape = (n_kv_heads, num_pages, page_size)
    return KVPages(
        k_pages=jnp.zeros(shape, dtype),
        k_scales=jnp.ones(sshape, jnp.float32),
        v_pages=jnp.zeros(shape, dtype),
        v_scales=jnp.ones(sshape, jnp.float32),
    )


def init_kv_pages_stacked(
    n_layers: int,
    n_kv_heads: int,
    num_pages: int,
    page_size: int,
    head_dim: int,
    dtype=jnp.int8,
) -> KVPages:
    """ALL layers' paged K/V as one KVPages whose leaves carry a leading
    layer dim [n_layers, ...] — the layout `decode_step`'s `lax.scan` over
    stacked layer params consumes (one scanned body instead of ~n_layers x
    ~12 separate XLA ops per token; the round-2 decode step was
    op-dispatch-bound at 56% of the weight-streaming floor)."""
    dtype, head_dim, _ = _resolve_cache_dtype(dtype, head_dim)
    shape = (n_layers, n_kv_heads, num_pages, page_size, head_dim)
    sshape = (n_layers, n_kv_heads, num_pages, page_size)
    return KVPages(
        k_pages=jnp.zeros(shape, dtype),
        k_scales=jnp.ones(sshape, jnp.float32),
        v_pages=jnp.zeros(shape, dtype),
        v_scales=jnp.ones(sshape, jnp.float32),
    )


def write_prompt_kv_stacked(
    pages: KVPages,   # stacked: leaves [n_layers, ...]
    k_prompt,  # [n_layers, prompt_len, n_kv_heads, head_dim]
    v_prompt,
    page_ids,  # [ceil(prompt_len / page_size)] int32 — this slot's pages
) -> KVPages:
    """Prefill write for EVERY layer in one scatter per tensor (the
    per-layer loop version costs n_layers separate device calls per
    admitted prefill bucket)."""
    page_size = pages.page_size
    n_layers, s = k_prompt.shape[:2]
    assert s % page_size == 0, "engine pads prompts to page multiples"
    n = s // page_size
    dtype = pages.k_pages.dtype
    packed = pages.k_pages.shape[-1] * 2 == k_prompt.shape[-1]
    kq, ks = _quantize_rows(k_prompt, dtype, packed)  # [L, S, Hkv, *]
    vq, vs = _quantize_rows(v_prompt, dtype, packed)

    def to_pages(x):  # [L, S, Hkv, D] -> [L, Hkv, n, page_size, D]
        return x.transpose(0, 2, 1, 3).reshape(
            n_layers, x.shape[2], n, page_size, -1
        )

    def to_scale_pages(x):  # [L, S, Hkv] -> [L, Hkv, n, page_size]
        return x.transpose(0, 2, 1).reshape(n_layers, x.shape[2], n, page_size)

    return KVPages(
        k_pages=pages.k_pages.at[:, :, page_ids].set(to_pages(kq)),
        k_scales=pages.k_scales.at[:, :, page_ids].set(to_scale_pages(ks)),
        v_pages=pages.v_pages.at[:, :, page_ids].set(to_pages(vq)),
        v_scales=pages.v_scales.at[:, :, page_ids].set(to_scale_pages(vs)),
    )


def _quantize_rows(x, dtype, packed: bool = False):
    """Per-row (last-axis) symmetric quantization -> (values, scales).
    ``packed``: INT4 — per-token scales at qmax 7, values packed
    split-half (see _resolve_cache_dtype)."""
    if packed:
        from cuda_flash_attention_tpu.quant.qtensor import quantize_rows_int4

        values, scales = quantize_rows_int4(x)
        return values, scales[..., 0]
    if not _is_quantized(dtype):
        return x.astype(dtype), jnp.ones(x.shape[:-1], jnp.float32)
    qmax = qmax_for(dtype)
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1)
    scales = jnp.maximum(amax, 1e-12) / qmax
    q = x / scales[..., None]
    if jnp.dtype(dtype) == jnp.dtype(jnp.int8):
        values = jnp.clip(jnp.round(q), -qmax, qmax).astype(jnp.int8)
    else:
        # Flush-to-zero below the fp8 min NORMAL: the paged decode kernels
        # then dequantize with a normal-only bit pattern (half the VPU
        # surgery of the subnormal-exact path — storage_cast's docstring).
        # Cost: values < 2^-6/qmax of the row amax (~3.5e-5 relative for
        # e4m3) round to 0 — far below the format's own 2^-4 mid-scale
        # quantization noise.  Kernel-vs-oracle exactness is preserved
        # because the flush happens at WRITE time, identically for both.
        d = jnp.dtype(dtype)
        min_normal = (2.0 ** -6 if d == jnp.dtype(jnp.float8_e4m3fn)
                      else 2.0 ** -14)
        q = jnp.where(jnp.abs(q) < min_normal, 0.0, q)
        values = jnp.clip(q, -qmax, qmax).astype(dtype)
    return values, scales


# Above this slot count the unrolled per-slot dynamic-update-slice append
# would bloat the step program (4 ops per slot); batched scatters take over.
_DUS_APPEND_MAX_SLOTS = 64


def append_token_kv(
    pages: KVPages,
    k_new,  # [num_seqs, n_kv_heads, head_dim] — one new token per slot
    v_new,
    page_table,  # [max_seqs, pages_per_seq] int32
    positions,   # [num_seqs] int32 — write position (current length)
    active,      # [num_seqs] bool — inactive slots must not clobber pages
) -> KVPages:
    """Single-token decode append for every slot.

    Inactive slots' writes are redirected to the reserved null page 0 (the
    allocator never hands it out) — cheaper than the gather + select needed
    to make them true no-ops, and page 0 is never attended (lengths gate).

    FORM MATTERS for layout (round-5 profiling, scripts/r5_layout_fix.py):
    the batched scatter `.at[:, ids, offs].set(...)` makes XLA pick a
    {3,0,2,1:T(4,128)} layout for the decode loop's cache carry, forcing a
    FULL-cache relayout copy per K/V per layer per step to feed the Pallas
    kernel (4.6 us each for int8 pages, 19.3 us for fp8 — the f8 relayout
    is ~4x slower and was most of the round-4 "fp8 anomaly").  Per-slot
    `dynamic_update_slice` writes keep the carry in the kernel-native
    default layout: measured 93.8 -> 79.7 us/step (int8) and 166 -> 95
    us/step (fp8) on the single-layer microbench.  Very large slot counts
    fall back to the scatter to bound program size."""
    page_size = pages.page_size
    page_idx = positions // page_size
    offsets = jnp.where(active, positions % page_size, 0)
    num_seqs = k_new.shape[0]
    page_ids = jnp.where(
        active, page_table[jnp.arange(num_seqs), page_idx], 0
    )  # [num_seqs]
    dtype = pages.k_pages.dtype
    packed = pages.k_pages.shape[-1] * 2 == k_new.shape[-1]
    kq, ks = _quantize_rows(k_new, dtype, packed)  # [S, Hkv, *], [S, Hkv]
    vq, vs = _quantize_rows(v_new, dtype, packed)

    if num_seqs <= _DUS_APPEND_MAX_SLOTS and not pages.stacked:
        # UNROLLED python loop, deliberately: a lax.scan form (tried first
        # for compile time) measured 0.98 ms/step on-chip vs 0.18 unrolled
        # — XLA does not keep the scan carry in place here and copies the
        # whole cache per slot iteration.  The unrolled chain of
        # dynamic-update-slices is pure in-place writes.
        kp, ksc = pages.k_pages, pages.k_scales
        vp, vsc = pages.v_pages, pages.v_scales
        hkv = kp.shape[0]
        for s in range(num_seqs):
            at = (0, page_ids[s], offsets[s], 0)
            kp = jax.lax.dynamic_update_slice(
                kp, kq[s][:, None, None, :], at
            )
            vp = jax.lax.dynamic_update_slice(
                vp, vq[s][:, None, None, :], at
            )
            ksc = jax.lax.dynamic_update_slice(
                ksc, ks[s].reshape(hkv, 1, 1), at[:3]
            )
            vsc = jax.lax.dynamic_update_slice(
                vsc, vs[s].reshape(hkv, 1, 1), at[:3]
            )
        return KVPages(k_pages=kp, k_scales=ksc, v_pages=vp, v_scales=vsc)

    kq = kq.transpose(1, 0, 2)  # [Hkv, S, D]
    vq = vq.transpose(1, 0, 2)
    ks = ks.T  # [Hkv, S]
    vs = vs.T
    return KVPages(
        k_pages=pages.k_pages.at[:, page_ids, offsets, :].set(kq),
        k_scales=pages.k_scales.at[:, page_ids, offsets].set(ks),
        v_pages=pages.v_pages.at[:, page_ids, offsets, :].set(vq),
        v_scales=pages.v_scales.at[:, page_ids, offsets].set(vs),
    )


def append_chunk_kv(
    pages: KVPages,
    k_chunk,  # [num_seqs, T, n_kv_heads, head_dim] — T new tokens per slot
    v_chunk,
    page_table,
    positions,   # [num_seqs] int32 — write position of the chunk's FIRST token
    active,      # [num_seqs] bool
) -> KVPages:
    """Multi-token append (speculative-decoding verification chunks): T
    consecutive tokens per slot, possibly crossing a page boundary.  T is
    small (the draft length + 1), so T single-token scatters — each an XLA
    in-place dynamic-update-slice — beat a gather-heavy general scatter."""
    t = k_chunk.shape[1]
    for i in range(t):
        pages = append_token_kv(
            pages, k_chunk[:, i], v_chunk[:, i], page_table,
            positions + i, active,
        )
    return pages


def write_chunk_kv_paged(
    pages: KVPages,
    k_chunk,  # [num_seqs, T, n_kv_heads, head_dim], T % page_size == 0
    v_chunk,
    page_table,
    first_positions,  # [num_seqs] int32 — MUST be page-aligned
    active,           # [num_seqs] bool
) -> KVPages:
    """Page-granular multi-token append for chunked (suffix) prefill: the
    chunk starts on a page boundary and spans whole pages, so every
    (slot, page) lands in ONE vectorized scatter instead of T per-token
    scatters (append_chunk_kv's form, built for small speculative chunks).
    Inactive slots write the reserved null page 0."""
    page_size = pages.page_size
    n, t, hkv, d = k_chunk.shape
    assert t % page_size == 0
    npg = t // page_size
    lo = first_positions // page_size
    ids = jnp.take_along_axis(
        page_table, lo[:, None] + jnp.arange(npg, dtype=jnp.int32)[None],
        axis=1,
    )  # [n, npg]
    ids = jnp.where(active[:, None], ids, 0).reshape(-1)
    dtype = pages.k_pages.dtype
    packed = pages.k_pages.shape[-1] * 2 == d
    kq, ks = _quantize_rows(k_chunk.reshape(n * t, hkv, d), dtype, packed)
    vq, vs = _quantize_rows(v_chunk.reshape(n * t, hkv, d), dtype, packed)

    def to_pages(x):  # [n*T, Hkv, D] -> [Hkv, n*npg, page_size, D]
        return x.transpose(1, 0, 2).reshape(hkv, n * npg, page_size, -1)

    def to_scale_pages(x):  # [n*T, Hkv] -> [Hkv, n*npg, page_size]
        return x.T.reshape(hkv, n * npg, page_size)

    return KVPages(
        k_pages=pages.k_pages.at[:, ids].set(to_pages(kq)),
        k_scales=pages.k_scales.at[:, ids].set(to_scale_pages(ks)),
        v_pages=pages.v_pages.at[:, ids].set(to_pages(vq)),
        v_scales=pages.v_scales.at[:, ids].set(to_scale_pages(vs)),
    )


def write_prompt_kv(
    pages: KVPages,
    k_prompt,  # [prompt_len, n_kv_heads, head_dim]
    v_prompt,
    page_ids,  # [ceil(prompt_len / page_size)] int32 — this slot's pages
) -> KVPages:
    """Prefill write: scatter a whole prompt's K/V into this slot's pages.
    prompt_len is padded to a page multiple by the caller (engine)."""
    page_size = pages.page_size
    s = k_prompt.shape[0]
    assert s % page_size == 0, "engine pads prompts to page multiples"
    n = s // page_size
    dtype = pages.k_pages.dtype
    packed = pages.k_pages.shape[-1] * 2 == k_prompt.shape[-1]
    kq, ks = _quantize_rows(k_prompt, dtype, packed)
    vq, vs = _quantize_rows(v_prompt, dtype, packed)
    # [S, Hkv, D] -> [Hkv, n_pages, page_size, D]
    def to_pages(x):
        return x.transpose(1, 0, 2).reshape(x.shape[1], n, page_size, -1)

    def to_scale_pages(x):  # [S, Hkv] -> [Hkv, n, page_size]
        return x.T.reshape(x.shape[1], n, page_size)

    return KVPages(
        k_pages=pages.k_pages.at[:, page_ids].set(to_pages(kq)),
        k_scales=pages.k_scales.at[:, page_ids].set(to_scale_pages(ks)),
        v_pages=pages.v_pages.at[:, page_ids].set(to_pages(vq)),
        v_scales=pages.v_scales.at[:, page_ids].set(to_scale_pages(vs)),
    )


class PageAllocator:
    """Host-side refcounted free-list page allocator (not traced; runs
    between steps).  Plain alloc/free is refcount 1; `share` lets several
    sequences point their page tables at ONE physical page (prefix caching)
    — the page returns to the free list when its last user frees it."""

    def __init__(self, num_pages: int):
        # Page 0 is reserved as the null page the table points at for
        # unallocated logical blocks (kernels skip them via lengths).
        self._free = list(range(num_pages - 1, 0, -1))
        self._rc: dict[int, int] = {}
        self.num_pages = num_pages
        # Called with the page id when a page's last reference is freed —
        # the engine hooks this to drop prefix-cache entries for dead pages.
        self.on_last_free = None

    @property
    def available(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> list[int]:
        if n > len(self._free):
            raise MemoryError(
                f"KV cache out of pages: need {n}, have {len(self._free)}"
            )
        out = [self._free.pop() for _ in range(n)]
        for p in out:
            self._rc[p] = 1
        return out

    def share(self, pages) -> None:
        """Add a reference to already-allocated pages (prefix reuse)."""
        for p in pages:
            if p != 0:
                self._rc[int(p)] += 1

    def refcount(self, page: int) -> int:
        return self._rc.get(int(page), 0)

    def free(self, pages) -> None:
        for p in pages:
            p = int(p)
            if p == 0:
                continue
            rc = self._rc.get(p, 1) - 1
            if rc > 0:
                self._rc[p] = rc
                continue
            self._rc.pop(p, None)
            self._free.append(p)
            if self.on_last_free is not None:
                self.on_last_free(p)
