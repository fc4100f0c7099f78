"""Aggregate an XPlane trace by HLO opcode / op family.

tools/trace_probe.py reports per-op rows; at 20k+ ops in a full train step
that hides the structure.  This tool groups device busy time by the HLO
opcode (the token after ``= type[...]{...}``), with convolutions further
split by operand shapes so forward convs, input-grad convs and filter-grad
convs of each stage separate.

Usage: python tools/trace_agg.py /tmp/trace_trainstep [iters] [top]
"""
from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.trace_probe import parse_xplanes

_OPCODE_RE = re.compile(r"=\s*(?:\([^)]*\)|[a-z0-9]+\[[^\]]*\](?:\{[^}]*\})?)\s*([a-z0-9_-]+)\(")
_SHAPE_RE = re.compile(r"([a-z0-9]+\[[0-9,]*\])")


def opcode_of(name: str) -> str:
    m = _OPCODE_RE.search(name)
    if m:
        return m.group(1)
    # fusion names like %convolution_add_fusion.414 = ... fusion(...)
    head = name.split(" = ")[0].lstrip("%")
    return re.sub(r"\.\d+$", "", head)


def family_of(name: str) -> str:
    """Finer key: opcode + result shape (and conv fusions keep their head
    name so conv/fusion variants separate)."""
    op = opcode_of(name)
    head = name.split(" = ")[0].lstrip("%")
    head = re.sub(r"\.\d+$", "", head)
    shapes = _SHAPE_RE.findall(name)
    out = shapes[0] if shapes else "?"
    return f"{head}|{op}|{out}"


def main():
    tdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_trainstep"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    rows = list(parse_xplanes(tdir))
    dev = [r for r in rows if "TPU" in r[0] or "device" in r[0].lower()]
    use = dev or rows
    # drop async copy/slice start-done pairs (in-flight duration overlaps
    # compute and double-counts) and module/region rows
    drop = ("copy-start", "copy-done", "slice-start", "slice-done",
            "all-reduce-start", "all-reduce-done")
    by_op = defaultdict(lambda: [0.0, 0])
    by_fam = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for plane, name, dur, cnt in use:
        if not name.startswith("%"):
            continue
        if any(name.lstrip("%").startswith(d) for d in drop):
            continue
        ms = dur / 1e9 / iters
        op = opcode_of(name)
        by_op[op][0] += ms
        by_op[op][1] += cnt
        by_fam[family_of(name)][0] += ms
        by_fam[family_of(name)][1] += cnt
        total += ms
    print(f"== {tdir}: {total:.1f} ms/iter device busy (ex async copies)")
    print("-- by opcode --")
    for op, (ms, cnt) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"  {op:40s} {ms:8.2f} ms/iter  (n={cnt})")
    print("-- by family (head|opcode|result shape) --")
    for fam, (ms, cnt) in sorted(by_fam.items(),
                                 key=lambda kv: -kv[1][0])[:top]:
        print(f"  {fam[:96]:96s} {ms:8.2f} ms/iter  (n={cnt})")


if __name__ == "__main__":
    main()
