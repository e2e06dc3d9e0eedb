"""Per-instruction HBM byte ledger from optimized HLO.

Parses compiled.as_text() of the bench train step and attributes
bytes (operands read + result written) to each top-level instruction,
aggregated by opcode and by shape. This is the ground truth for "where
do the 63 GB go" — the VERDICT r2 ask for a per-tensor residual ledger.

    PYTHONPATH=/root/repo python -u tools/hlo_ledger.py minres [topN]
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict

import jax

sys.path.insert(0, "/root/repo")

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1, "u64": 8, "u32": 4, "u16": 2,
    "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
# an opcode is a lowercase word(-word)* immediately followed by '(' —
# layout markers T(...)/S(...) are uppercase and excluded
OPCODE_RE = re.compile(r"(?<![\w%.])([a-z][a-z0-9\-]*)\(")


def shape_bytes(type_str: str) -> int:
    """Bytes of a (possibly tuple) HLO type string."""
    total = 0
    for m in SHAPE_RE.finditer(type_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def parse_entry(hlo: str):
    """Yield (name, opcode, result_bytes, operand_names, line) for the
    ENTRY computation's instructions."""
    entry_start = hlo.index("ENTRY ")
    body = hlo[entry_start:]
    body = body[: body.index("\n}") + 2]
    insts = []
    defs = {}
    for line in body.splitlines():
        line = line.strip()
        if " = " not in line or not (line.startswith("%") or line.startswith("ROOT")):
            continue
        name_part, rest = line.split(" = ", 1)
        name = name_part.replace("ROOT ", "").lstrip("%")
        m = OPCODE_RE.search(rest)
        if not m:
            continue
        opcode = m.group(1)
        type_str = rest[: m.start()]
        args = rest[m.end():]
        rb = shape_bytes(type_str)
        defs[name] = rb
        ops = re.findall(r"%([\w.\-]+)", args)
        insts.append((name, opcode, rb, ops, line))
    return insts, defs


def ledger(hlo: str, top_n: int = 25):
    insts, defs = parse_entry(hlo)
    by_op = defaultdict(float)
    rows = []
    for name, opcode, rb, ops, line in insts:
        if opcode in ("parameter", "constant", "get-tuple-element", "tuple",
                      "bitcast", "after-all"):
            continue
        # async done-ops alias their start buffers; count starts only
        if opcode.endswith("-done") or opcode == "async-done":
            continue
        operand_b = sum(defs.get(o, 0) for o in ops)
        total = rb + operand_b
        by_op[opcode] += total
        rows.append((total, opcode, name, rb, operand_b, line[:170]))
    rows.sort(reverse=True)
    print("== bytes by opcode (operand reads + result writes) ==")
    for op, b in sorted(by_op.items(), key=lambda kv: -kv[1]):
        print(f"  {op:28s} {b/1e9:8.2f} GB")
    print(f"  {'TOTAL':28s} {sum(by_op.values())/1e9:8.2f} GB")
    print(f"\n== top {top_n} instructions ==")
    for total, opcode, name, rb, ob, line in rows[:top_n]:
        print(f"  {total/1e9:6.2f} GB ({ob/1e9:5.2f}r+{rb/1e9:5.2f}w) {line}")
    return by_op, rows


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "minres"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    from tools.profile_bn_minres import build

    jax.config.update("jax_default_prng_impl", "rbg")
    state, step = build(kind)
    compiled = jax.jit(step, donate_argnums=(0,)).lower(state).compile()
    hlo = compiled.as_text()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    print(f"[{kind}] optimized HLO: {len(hlo.splitlines())} lines; "
          f"cost_analysis bytes accessed {ca.get('bytes accessed', 0)/1e9:.2f} GB")
    ledger(hlo, top_n)


if __name__ == "__main__":
    main()
