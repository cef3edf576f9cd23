"""Engine CLI — the reference CLI driver's contract on TPU.

Usage (parity with /root/reference/include/error_utils.h:15-19 and
src/main.cpp):

    python -m cuda_flash_attention_tpu.cli \
        <naive|fa1|fa2> <forward|backward|forward_backward> <fp16|fp32|bf16> \
        <data_dir>

Contract parity with src/main.cpp:
  * shape parsed from the data dir's basename B{B}_H{H}_S{S}_D{D} (:32-49)
  * forward: loads Q/K/V.bin, writes O.bin + logsumexp.bin (:110-113)
  * backward: additionally loads O.bin + logsumexp.bin (:66-81) and dO.bin
    if present else dO = 1 (:84-92); writes dQ/dK/dV.bin (:114-118)
  * forward_backward: runs both in one invocation (also accepts the
    README's "forward-backward" spelling the reference rejects)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def run(method: str, mode: str, precision: str, data_dir: str,
        causal: bool = False) -> dict:
    import jax.numpy as jnp

    from cuda_flash_attention_tpu.dispatch import (
        ModeType,
        run_flash_attention,
    )
    from cuda_flash_attention_tpu.utils.io import (
        file_exists,
        load_binary_file,
        parse_config_string,
        save_binary_file,
    )
    from cuda_flash_attention_tpu.utils.timing import Timer

    b, h, s, d = parse_config_string(data_dir)
    shape = (b, h, s, d)
    print(f"[cfa-tpu] config: B={b} H={h} S={s} D={d}")
    q = jnp.asarray(load_binary_file(os.path.join(data_dir, "Q.bin"), shape))
    k = jnp.asarray(load_binary_file(os.path.join(data_dir, "K.bin"), shape))
    v = jnp.asarray(load_binary_file(os.path.join(data_dir, "V.bin"), shape))

    mode_t = ModeType.parse(mode)
    kwargs: dict = {}
    if mode_t in (ModeType.BACKWARD,):
        o_path = os.path.join(data_dir, "O.bin")
        lse_path = os.path.join(data_dir, "logsumexp.bin")
        if not (file_exists(o_path) and file_exists(lse_path)):
            raise FileNotFoundError(
                "backward mode requires O.bin and logsumexp.bin from a prior "
                "forward run (reference parity: src/main.cpp:66-81)"
            )
        kwargs["o"] = jnp.asarray(load_binary_file(o_path, shape))
        kwargs["lse"] = jnp.asarray(
            load_binary_file(lse_path, (b, h, s))
        )
    if mode_t in (ModeType.BACKWARD, ModeType.FORWARD_BACKWARD):
        do_path = os.path.join(data_dir, "dO.bin")
        if file_exists(do_path):
            kwargs["do"] = jnp.asarray(load_binary_file(do_path, shape))
            print("[cfa-tpu] using dO.bin")
        else:
            print("[cfa-tpu] dO.bin absent -> dO = 1 (L = sum(O))")

    timer = Timer()
    timer.start()
    out = run_flash_attention(
        method, mode_t, precision, q, k, v, causal=causal, **kwargs
    )
    timer.stop(list(out.values())[-1])

    written = []
    if "o" in out:
        save_binary_file(os.path.join(data_dir, "O.bin"), out["o"])
        written.append("O.bin")
        if out.get("lse") is not None:
            save_binary_file(
                os.path.join(data_dir, "logsumexp.bin"), out["lse"]
            )
            written.append("logsumexp.bin")
    for name, key in [("dQ.bin", "dq"), ("dK.bin", "dk"), ("dV.bin", "dv")]:
        if key in out:
            save_binary_file(os.path.join(data_dir, name), out[key])
            written.append(name)
    print(f"[cfa-tpu] wrote {' '.join(written)} (total {timer.mean_ms:.2f} ms"
          " incl. compile)")
    return out


def usage() -> str:
    return (
        "usage: python -m cuda_flash_attention_tpu.cli "
        "<naive|fa1|fa2> <forward|backward|forward_backward> "
        "<fp16|fp32|bf16> <data_dir> [--causal]"
    )


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    causal = "--causal" in argv
    argv = [a for a in argv if a != "--causal"]
    if len(argv) != 4:
        print(usage(), file=sys.stderr)
        return 2
    method, mode, precision, data_dir = argv
    t0 = time.time()
    try:
        run(method, mode, precision, data_dir, causal=causal)
    except (ValueError, FileNotFoundError) as e:
        print(f"error: {e}", file=sys.stderr)
        print(usage(), file=sys.stderr)
        return 1
    print(f"[cfa-tpu] done in {time.time() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
