"""Evidence consistency checker: every headline number in BASELINE.md must
trace to a committed artifact in evidence/r5/ (round-4 verdict item 7 —
stale/conflicting committed evidence: test counts, int4 decode, scheduler
ratio all disagreed across documents).

Checks are structural, not string-exact: the checker parses the evidence
JSON/logs and verifies BASELINE.md quotes the same value (within rounding).
Exits non-zero listing every mismatch.

Usage:  python scripts/check_evidence.py
"""

import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
EV = ROOT / "evidence" / "r5"
BASELINE = (ROOT / "BASELINE.md").read_text()

errors = []


def check(name, ok, detail=""):
    if not ok:
        errors.append(f"{name}: {detail}")


def near(text, value, tol=0.02):
    """True if `text` (BASELINE.md) contains `value` within tol relative."""
    if value is None:
        return False
    for m in re.finditer(r"(\d+(?:[.,]\d+)?)k?", text):
        s = m.group(1).replace(",", "")
        try:
            x = float(s)
        except ValueError:
            continue
        scale = 1000.0 if m.group(0).endswith("k") else 1.0
        if value and abs(x * scale - value) / abs(value) < tol:
            return True
        if abs(x - value) < 1e-9:
            return True
    return False


def load_json(p):
    try:
        return json.loads((EV / p).read_text().strip().splitlines()[-1])
    except Exception as e:  # noqa: BLE001
        errors.append(f"{p}: unreadable ({e})")
        return None


# 1. Test suite count quoted in BASELINE.md matches the committed log.
suite = None
log = EV / "test_suite.log"
if log.exists():
    m = re.search(r"(\d+) passed", log.read_text())
    suite = m and int(m.group(1))
    check("suite-count", suite and f"{suite} passed" in BASELINE,
          f"log says '{suite} passed'; BASELINE.md must quote exactly that")
else:
    errors.append("test_suite.log missing from evidence/r5")

# 2. Decode numbers: each published dtype line matches its evidence file.
for dt, label in (("int8", "INT8"), ("float8_e4m3fn", "FP8"),
                  ("int4", "INT4"), ("bfloat16", "bf16")):
    d = load_json(f"decode_{dt}.json")
    if d:
        tok = d.get("tokens_per_sec_per_chip")
        check(f"decode-{dt}", near(BASELINE, tok),
              f"evidence {tok:.0f} tok/s not found in BASELINE.md")

# 3. Engine ratio: BASELINE quotes only values present in evidence.
r = load_json("engine_device_ratio_cpu.json")
if r:
    check("engine-ratio-platform", r.get("platform") == "cpu",
          f"ratio was measured on platform={r.get('platform')!r}, not cpu")
    check("engine-ratio-value", near(BASELINE, r.get("engine_overhead_x")),
          f"evidence ratio {r.get('engine_overhead_x'):.2f}x "
          "not quoted in BASELINE.md")

# 4. Kernel headline from bench.json.
b = load_json("bench.json")
if b:
    check("headline-tflops", near(BASELINE, b.get("value")),
          f"bench value {b.get('value')} not in BASELINE.md")
    d128 = (b.get("extra") or {}).get("d128_fwd_bwd_tflops")
    if d128:
        check("d128-tflops", near(BASELINE, d128),
              f"d128 {d128} TFLOPS not in BASELINE.md")

if errors:
    print("EVIDENCE CHECK FAILED:")
    for e in errors:
        print("  -", e)
    sys.exit(1)
print("evidence check: all published numbers trace to evidence/r5/")
