"""Join a jax.profiler trace with an HLO text dump to attribute device time
(including async DMA in-flight time) to JAX source lines.

Usage: python tools/attribute_trace.py <trace_dir> <hlo.txt> [top_n]

The xplane trace gives per-HLO-op total durations; the HLO dump carries
op -> source_file:line metadata. Aggregating time by source line shows which
model code is responsible for the DMA-heavy ops (slice-start/copy-start) that
dominate the batched-ensemble step.
"""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspeedy_tpu.utils.xplane import device_op_totals


_DEF_PAT = re.compile(r"^\s*(?:ROOT )?%(?P<name>[\w.-]+) = ")
_SRC_PAT = re.compile(
    r"metadata={.*?source_file=\"(?P<file>[^\"]+)\".*?source_line=(?P<line>\d+)")
_OPND_PAT = re.compile(r"%([\w.-]+)")


def hlo_source_map(hlo_path: str) -> tuple[dict, dict]:
    """(op name -> source, op name -> [operand names]) from an HLO dump.
    MSA-inserted async copies (copy-start/slice-start) carry no metadata;
    callers chase operands to find a sourced ancestor."""
    src = {}
    opnds = {}
    with open(hlo_path) as f:
        for line in f:
            d = _DEF_PAT.match(line)
            if not d:
                continue
            name = d.group("name")
            m = _SRC_PAT.search(line)
            if m:
                src[name] = (f"{os.path.basename(m.group('file'))}"
                             f":{m.group('line')}")
            rhs = line[d.end():]
            ops = _OPND_PAT.findall(rhs)
            opnds[name] = [o for o in ops if o != name]
    return src, opnds


def resolve_source(name: str, src: dict, opnds: dict, hops: int = 4):
    """Source for `name`, chasing operand chains for metadata-less ops."""
    seen = set()
    frontier = [name]
    for _ in range(hops + 1):
        nxt = []
        for n in frontier:
            if n in seen:
                continue
            seen.add(n)
            if n in src:
                return src[n]
            nxt.extend(opnds.get(n, []))
        frontier = nxt
        if not frontier:
            break
    return None


def main():
    trace_dir = sys.argv[1]
    hlo_path = sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    srcmap, opnds = hlo_source_map(hlo_path)
    totals = device_op_totals(trace_dir)

    by_src = defaultdict(float)
    by_src_kind = defaultdict(float)
    unattributed = 0.0
    for name, secs in totals.items():
        head = name.lstrip("%").split(" ", 1)[0]
        kind = head.split(".")[0].rstrip("0123456789")
        src = resolve_source(head, srcmap, opnds)
        if src is None:
            unattributed += secs
            continue
        by_src[src] += secs
        by_src_kind[(src, kind)] += secs

    total = sum(totals.values()) or 1.0
    print(f"{'source':42s} {'total_s':>9s} {'%':>6s}  top kinds")
    for src, secs in sorted(by_src.items(), key=lambda kv: -kv[1])[:top_n]:
        kinds = sorted(((k[1], v) for k, v in by_src_kind.items()
                        if k[0] == src), key=lambda kv: -kv[1])[:3]
        kind_s = " ".join(f"{k}:{v:.2f}" for k, v in kinds)
        print(f"{src:42s} {secs:9.3f} {100*secs/total:6.2f}  {kind_s}")
    print(f"{'(unattributed)':42s} {unattributed:9.3f} "
          f"{100*unattributed/total:6.2f}")


if __name__ == "__main__":
    main()
