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
- undefined names (Load of a name never bound anywhere in the file —
  catches typos/NameErrors; scope-insensitive so it never false-positives
  on closures)
- missing annotations on public defs in the package
  (``disallow_untyped_defs`` analog, `reference pyproject.toml:85`)
- return consistency (a function mixing ``return value`` with bare
  ``return``)

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
    findings.extend(check_undefined_names(path, tree))
    findings.extend(check_return_consistency(path, tree))
    if "p_div_gnn_tpu" in path.parts:
        findings.extend(check_annotations(path, tree))
    return [
        f for f in findings
        if int(f.split(":", 2)[1]) not in noqa_lines
    ]


def _bound_names(tree: ast.AST) -> set[str]:
    """Every name the file binds anywhere (scope-insensitive superset)."""
    bound: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(
            node.ctx, (ast.Store, ast.Del)
        ):
            bound.add(node.id)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
            bound.add(node.name)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                if a.name == "*":
                    return bound | {"*"}  # star import: skip the check
                bound.add((a.asname or a.name).split(".")[0])
        elif isinstance(node, ast.arg):
            bound.add(node.arg)
        elif isinstance(node, ast.ExceptHandler) and node.name:
            bound.add(node.name)
        elif isinstance(node, ast.MatchAs) and node.name:
            bound.add(node.name)
        elif isinstance(node, ast.MatchStar) and node.name:
            bound.add(node.name)
        elif isinstance(node, ast.MatchMapping) and node.rest:
            bound.add(node.rest)
        elif isinstance(node, ast.Global):
            bound.update(node.names)
    return bound


_IMPLICIT = {
    "__file__", "__name__", "__doc__", "__package__", "__spec__",
    "__loader__", "__builtins__", "__debug__", "__annotations__",
    "__class__",
}


def check_undefined_names(path: Path, tree: ast.AST) -> list[str]:
    """Flag Load of a name never bound anywhere in the file. Deliberately
    scope-insensitive: closures/comprehensions can't false-positive, only
    genuine typos and missing imports are reported."""
    import builtins

    bound = _bound_names(tree)
    if "*" in bound:
        return []
    known = bound | set(dir(builtins)) | _IMPLICIT
    out = []
    seen: set[str] = set()
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Name)
            and isinstance(node.ctx, ast.Load)
            and node.id not in known
            and node.id not in seen
        ):
            seen.add(node.id)
            out.append(f"{path}:{node.lineno}: undefined name '{node.id}'")
    return out


def check_return_consistency(path: Path, tree: ast.AST) -> list[str]:
    """A function mixing ``return value`` with bare ``return`` almost
    always means a forgotten value (callers get None on some paths)."""
    out = []
    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        bare, valued = [], []
        # returns belonging to THIS def, not nested ones
        stack: list[ast.AST] = list(ast.iter_child_nodes(node))
        while stack:
            sub = stack.pop()
            if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef,
                                ast.Lambda)):
                continue
            if isinstance(sub, ast.Return):
                (valued if sub.value is not None else bare).append(sub)
            stack.extend(ast.iter_child_nodes(sub))
        # `return None` written explicitly counts as valued — mixing that
        # with bare returns is style, not a bug; only flag value+bare mixes
        # where the value is not a plain None constant
        real_valued = [
            r for r in valued
            if not (isinstance(r.value, ast.Constant) and r.value.value is None)
        ]
        if bare and real_valued:
            out.append(
                f"{path}:{node.lineno}: '{node.name}' mixes bare 'return' "
                f"(line {bare[0].lineno}) with 'return <value>' "
                f"(line {real_valued[0].lineno})"
            )
    return out


def check_annotations(path: Path, tree: ast.AST) -> list[str]:
    """``disallow_untyped_defs`` analog for the package: public functions
    (module- and class-level, name not starting with '_') must annotate
    every parameter (except self/cls) and the return type."""
    out = []

    def visit_defs(body: list[ast.stmt], in_class: bool) -> None:
        for node in body:
            if isinstance(node, ast.ClassDef):
                visit_defs(node.body, in_class=True)
            elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if node.name.startswith("_"):
                    continue
                a = node.args
                params = a.posonlyargs + a.args + a.kwonlyargs
                if in_class and params and params[0].arg in ("self", "cls"):
                    params = params[1:]
                missing = [p.arg for p in params if p.annotation is None]
                for extra in (a.vararg, a.kwarg):
                    if extra is not None and extra.annotation is None:
                        missing.append(extra.arg)
                if missing:
                    out.append(
                        f"{path}:{node.lineno}: public def '{node.name}' "
                        f"missing parameter annotations: {missing}"
                    )
                if node.returns is None:
                    out.append(
                        f"{path}:{node.lineno}: public def '{node.name}' "
                        "missing return annotation"
                    )

    visit_defs(getattr(tree, "body", []), in_class=False)
    return out


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
