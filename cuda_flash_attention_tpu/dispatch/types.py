"""Method/mode/precision enums.

Parity with /root/reference/include/enum_types.h:3-18 (ComputeType, ModeType,
ComputeDataType), extended with the TPU-native precisions (bf16 tiles, and
the quantized KV types used by the decode engine).
"""

from __future__ import annotations

import enum


class ComputeType(enum.Enum):
    VANILLA = "vanilla"  # materialized pure-XLA attention (kernels #7 analog)
    FLASH_ATTENTION_1 = "fa1"
    FLASH_ATTENTION_2_NAIVE = "fa2-naive"
    FLASH_ATTENTION_2 = "fa2"

    @classmethod
    def parse(cls, s: str) -> "ComputeType":
        aliases = {
            "naive": cls.VANILLA,  # reference CLI calls vanilla "naive"
            "vanilla": cls.VANILLA,
            "vanilla-attn": cls.VANILLA,
            "fa1": cls.FLASH_ATTENTION_1,
            "fa2-naive": cls.FLASH_ATTENTION_2_NAIVE,
            "fa2_naive": cls.FLASH_ATTENTION_2_NAIVE,
            "fa2": cls.FLASH_ATTENTION_2,
        }
        try:
            return aliases[s.lower()]
        except KeyError:
            raise ValueError(
                f"unknown method {s!r}; expected one of {sorted(aliases)}"
            ) from None


class ModeType(enum.Enum):
    FORWARD = "forward"
    BACKWARD = "backward"
    FORWARD_BACKWARD = "forward_backward"

    @classmethod
    def parse(cls, s: str) -> "ModeType":
        s = s.lower().replace("-", "_")  # accept the README's
        # "forward-backward" spelling the reference parser rejects
        # (README.md:148 vs src/utils.cpp:82) — a documented quirk we fix.
        for m in cls:
            if m.value == s:
                return m
        raise ValueError(f"unknown mode {s!r}")


class ComputeDataType(enum.Enum):
    FP32 = "fp32"
    FP16 = "fp16"  # storage-precision analog of the reference's fp16-SHM
    BF16 = "bf16"  # TPU-native reduced-precision tiles

    @classmethod
    def parse(cls, s: str) -> "ComputeDataType":
        for m in cls:
            if m.value == s.lower():
                return m
        raise ValueError(f"unknown precision {s!r}")
