"""Minimal vendored static checker (no third-party linters are installable
in this image — zero egress). Parity target: the reference relies on strict
mypy as its main static net (`/root/reference/pyproject.toml:83-106`); this
tool covers the executable subset we can check offline:

- syntax (ast.parse of every file)
- unused imports (module scope and function scope)
- duplicate top-level definitions (def/class shadowing an earlier one)
- bare ``except:`` clauses
- mutable default arguments (list/dict/set literals)
- ``== None`` / ``!= None`` comparisons

Run via ``make lint`` (or ``make check`` for lint + tests). Exit code 1 on
any finding.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

ROOTS = ["p_div_gnn_tpu", "tests", "scripts", "tools",
         "bench.py", "__graft_entry__.py"]

# names that are conventionally imported for side effects / re-export
SIDE_EFFECT_OK = {"__future__"}


class ImportTracker(ast.NodeVisitor):
    """Collect (alias, node) for imports and all referenced names, per
    module. Function-scope imports are checked within their function."""

    def __init__(self) -> None:
        self.imports: list[tuple[str, ast.AST, str]] = []  # (name, node, mod)
        self.used: set[str] = set()

    def visit_Import(self, node: ast.Import) -> None:
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imports.append((name, node, a.name))

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        mod = node.module or ""
        if mod in SIDE_EFFECT_OK:
            return
        for a in node.names:
            if a.name == "*":
                continue
            self.imports.append((a.asname or a.name, node, mod))

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.generic_visit(node)


def check_file(path: Path) -> list[str]:
    findings: list[str] = []
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:
        return [f"{path}:{exc.lineno}: syntax error: {exc.msg}"]
    noqa_lines = {
        i + 1 for i, line in enumerate(src.splitlines()) if "# noqa" in line
    }

    # referenced names anywhere (incl. inside strings for __all__ re-export)
    tracker = ImportTracker()
    tracker.visit(tree)
    # imports inside try: blocks are availability probes — exempt
    probe_nodes: set[int] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Try):
            for sub in ast.walk(node):
                if isinstance(sub, (ast.Import, ast.ImportFrom)):
                    probe_nodes.add(id(sub))
    tracker.imports = [
        (n, node, m) for n, node, m in tracker.imports
        if id(node) not in probe_nodes
    ]
    exported = set()
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign) and node.targets
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == "__all__"):
            for elt in getattr(node.value, "elts", []):
                if isinstance(elt, ast.Constant):
                    exported.add(elt.value)
    for name, node, mod in tracker.imports:
        if name not in tracker.used and name not in exported:
            findings.append(
                f"{path}:{node.lineno}: unused import '{name}' (from {mod})"
            )

    # duplicate top-level defs
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            if node.name in seen:
                findings.append(
                    f"{path}:{node.lineno}: '{node.name}' redefines the "
                    f"definition at line {seen[node.name]}"
                )
            seen[node.name] = node.lineno

    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            findings.append(f"{path}:{node.lineno}: bare 'except:'")
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    findings.append(
                        f"{path}:{node.lineno}: mutable default argument "
                        f"in '{node.name}'"
                    )
        if isinstance(node, ast.Compare):
            for op, cmp_ in zip(node.ops, node.comparators):
                if (isinstance(op, (ast.Eq, ast.NotEq))
                        and isinstance(cmp_, ast.Constant)
                        and cmp_.value is None):
                    findings.append(
                        f"{path}:{node.lineno}: use 'is None' / "
                        "'is not None', not ==/!="
                    )
    return [
        f for f in findings
        if int(f.split(":", 2)[1]) not in noqa_lines
    ]


def main() -> int:
    repo = Path(__file__).resolve().parent.parent
    files: list[Path] = []
    for root in ROOTS:
        p = repo / root
        if p.is_file():
            files.append(p)
        else:
            files.extend(sorted(p.rglob("*.py")))
    findings: list[str] = []
    for f in files:
        findings.extend(check_file(f))
    for line in findings:
        print(line)
    print(f"lint: {len(files)} files, {len(findings)} findings",
          file=sys.stderr)
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
