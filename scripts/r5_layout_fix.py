"""Round-5: kill the per-step KV-cache LAYOUT COPY in the decode loop.

The fp8-anomaly profile (scripts/r5_fp8_profile.py) found that EVERY decode
step relayouts the ENTIRE page buffer: the append scatter's fusion emits
layout {3,0,2,1:T(4,128)(4,1)} while the Pallas kernel demands the default
{3,2,1,0:T(8,128)(4,1)} — one full-cache HBM pass per K/V per layer per
step (int8: 4.6 us x8; fp8: 19.3 us x8 — f8 relayout is ~4x slower than
s8, which is most of the fp8 "anomaly").  This script A/Bs append formul-
ations to find one whose output layout matches the kernel.

Usage (on the chip):  python scripts/r5_layout_fix.py
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cuda_flash_attention_tpu.decode.attention import paged_decode_attention
from cuda_flash_attention_tpu.decode.kv_cache import KVPages
from cuda_flash_attention_tpu.utils.profiling import profile_ops

HKV, P, PAGE, D = 4, 81, 128, 64
SEQS, HQ = 16, 8


def mk_pages(dtype):
    return KVPages(
        k_pages=jnp.zeros((HKV, P, PAGE, D), dtype),
        k_scales=jnp.ones((HKV, P, PAGE), jnp.float32),
        v_pages=jnp.zeros((HKV, P, PAGE, D), dtype),
        v_scales=jnp.ones((HKV, P, PAGE), jnp.float32),
    )


def scatter_4d(pages, kq, ks, page_ids, offsets):
    """Current form: 4D scatter on [Hkv, P, page, D]."""
    return KVPages(
        k_pages=pages.k_pages.at[:, page_ids, offsets, :].set(kq),
        k_scales=pages.k_scales.at[:, page_ids, offsets].set(ks),
        v_pages=pages.v_pages.at[:, page_ids, offsets, :].set(kq),
        v_scales=pages.v_scales.at[:, page_ids, offsets].set(ks),
    )


def scatter_flat(pages, kq, ks, page_ids, offsets):
    """Flattened-token-axis form: scatter on [Hkv, P*page, D] then reshape
    back — the update touches one contiguous token row per slot."""
    tok = page_ids * PAGE + offsets

    def upd(p4, u):
        flat = p4.reshape(HKV, P * PAGE, D)
        return flat.at[:, tok, :].set(u).reshape(HKV, P, PAGE, D)

    def upd_s(s3, u):
        flat = s3.reshape(HKV, P * PAGE)
        return flat.at[:, tok].set(u).reshape(HKV, P, PAGE)

    return KVPages(
        k_pages=upd(pages.k_pages, kq),
        k_scales=upd_s(pages.k_scales, ks),
        v_pages=upd(pages.v_pages, kq),
        v_scales=upd_s(pages.v_scales, ks),
    )


def scatter_dus(pages, kq, ks, page_ids, offsets):
    """Per-slot dynamic_update_slice loop (unrolled SEQS in-place updates)."""
    kp, ksc, vp, vsc = (pages.k_pages, pages.k_scales,
                        pages.v_pages, pages.v_scales)
    for s in range(SEQS):
        kp = jax.lax.dynamic_update_slice(
            kp, kq[:, s][:, None, None, :], (0, page_ids[s], offsets[s], 0)
        )
        vp = jax.lax.dynamic_update_slice(
            vp, kq[:, s][:, None, None, :], (0, page_ids[s], offsets[s], 0)
        )
        ksc = jax.lax.dynamic_update_slice(
            ksc, ks[:, s][:, None, None], (0, page_ids[s], offsets[s])
        )
        vsc = jax.lax.dynamic_update_slice(
            vsc, ks[:, s][:, None, None], (0, page_ids[s], offsets[s])
        )
    return KVPages(k_pages=kp, k_scales=ksc, v_pages=vp, v_scales=vsc)


def bench(form, dtype, label, steps=16):
    table = jnp.asarray(
        np.arange(1, SEQS * 5 + 1, dtype=np.int32).reshape(SEQS, 5)
    )
    lengths = jnp.full((SEQS,), 130, jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(pages, q):
        def body(i, carry):
            pages, q = carry
            o = paged_decode_attention(q, pages, table, lengths + i)
            kq = (o[:, :HKV] * 0 + 1).transpose(1, 0, 2).astype(
                pages.k_pages.dtype
            )  # [Hkv, SEQS, D], data-dep on o
            ks = jnp.ones((HKV, SEQS), jnp.float32)
            page_ids = table[jnp.arange(SEQS), (lengths + i) // PAGE]
            offsets = (lengths + i) % PAGE
            pages = form(pages, kq, ks, page_ids, offsets)
            return pages, o
        return jax.lax.fori_loop(0, steps, body, (pages, q))

    q = jnp.ones((SEQS, HQ, D), jnp.bfloat16)
    ops = profile_ops(lambda pg, q: run(jax.tree.map(lambda x: x + 0, pg), q),
                      mk_pages(dtype), q, iters=2)
    total = sum(op.total_ms for op in ops) / 2
    copies = sum(
        op.total_ms for op in ops
        if op.name.startswith("%copy") and "128,64" in op.name
    ) / 2
    print(f"{label:14s} {str(jnp.dtype(dtype)):12s} total {total:7.3f} ms "
          f"per-step {total/steps*1e3:7.1f} us  page-copies {copies:6.3f} ms")
    for op in ops[:4]:
        print(f"    {op.mean_ms:8.4f} ms x{op.count:<3d} {op.name[:100]}")


if __name__ == "__main__":
    for dtype in (jnp.int8, jnp.float8_e4m3fn):
        for label, form in (
            ("scatter_4d", scatter_4d),
            ("scatter_flat", scatter_flat),
            ("scatter_dus", scatter_dus),
        ):
            bench(form, dtype, label)
