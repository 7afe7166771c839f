"""Structural overlap analysis of compiled HLO text (round-5, VERDICT
weak #5).

The halo design keeps the per-step ghost collective DATA-INDEPENDENT of
the local projection matmuls (models/epd.py Processor halo branch), so
XLA's latency-hiding scheduler is free to overlap the wire time with
local MXU work. A claim about the COMPILED artifact needs checking on
the compiled artifact: these helpers parse `compiled.as_text()`, build
the def-use graph of the computation containing the collective, and
report which dot instructions are neither ancestors nor descendants of
it — i.e. the local compute that can legally run while the collective
is in flight. (On the single-chip CI environment the multi-device
program only compiles for the host platform, which does not emit the
async `-start/-done` pairs TPU does; structural independence in the
optimized HLO is the strongest schedule-level fact available and is
exactly the property the async scheduler needs.)
"""

from __future__ import annotations

import re
from typing import Any


# def-line name: `  %name = ...` (optionally ROOT)
_NAME = re.compile(r"^\s*(?:ROOT\s+)?(%[\w.\-]+)\s*=")
# op name: the identifier right after the closing bracket of the result
# type (`f32[..]{..} dot(`, `pred[] compare(`, `(...tuple...) all-to-all(`).
# Tuple types may contain `/*index=N*/` comments, so we can't scan for
# "the first word before a paren" from the `=`.
_OP = re.compile(r"[\]\})]\s*([a-z][\w\-]*)\(")
_OPND = re.compile(r"%[\w.\-]+")


def _computation_blocks(hlo_text: str) -> list[str]:
    """Split module text into computation bodies (brace-delimited)."""
    blocks = []
    depth = 0
    start = None
    for i, ch in enumerate(hlo_text):
        if ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0 and start is not None:
                blocks.append(hlo_text[start : i + 1])
                start = None
    return blocks


def analyze_collective_overlap(
    hlo_text: str, collective: str = "all-to-all"
) -> dict[str, Any]:
    """Find the computation containing ``collective`` and classify every
    ``dot`` instruction in it as ancestor / descendant / independent of
    the collective. Returns a report dict."""
    block = None
    for b in _computation_blocks(hlo_text):
        if re.search(rf"=\s*[^=]*\b{collective}\(", b):
            block = b
            break
    if block is None:
        raise ValueError(f"no `{collective}` instruction in the module")

    defs: dict[str, list[str]] = {}
    ops: dict[str, str] = {}
    order: list[str] = []
    for line in block.splitlines():
        m = _NAME.match(line)
        if not m:
            continue
        name = m.group(1)
        rhs = line.split("=", 1)[1]
        mo = _OP.search(rhs)
        if not mo:
            continue
        op = mo.group(1)
        # operands = %refs on the line after the '=' (minus the def name;
        # result types never contain % so type text is inert)
        opnds = [o for o in _OPND.findall(rhs) if o != name]
        defs[name] = opnds
        ops[name] = op
        order.append(name)

    coll = next(n for n in order if ops[n] == collective)

    def closure(seeds: set[str], forward: bool) -> set[str]:
        # forward=False: ancestors via operand edges; True: descendants
        out: set[str] = set()
        frontier = list(seeds)
        users: dict[str, list[str]] = {}
        if forward:
            for n, opnds in defs.items():
                for o in opnds:
                    users.setdefault(o, []).append(n)
        while frontier:
            n = frontier.pop()
            nexts = users.get(n, []) if forward else defs.get(n, [])
            for nn in nexts:
                if nn not in out:
                    out.add(nn)
                    frontier.append(nn)
        return out

    ancestors = closure({coll}, forward=False)
    descendants = closure({coll}, forward=True)

    dots = [n for n in order if ops[n] in ("dot", "dot-general")]
    report = {
        "collective": coll,
        "n_instructions": len(order),
        "dots": [],
        "independent_dots": [],
    }
    for d in dots:
        if d in ancestors:
            cls = "ancestor"
        elif d in descendants:
            cls = "descendant"
        else:
            cls = "independent"
            report["independent_dots"].append(d)
        report["dots"].append({"name": d, "class": cls})
    return report
