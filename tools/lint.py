"""Dependency-free static lint gate (the reference gates pushes on
ruff+mypy+black, /root/reference/prepush.sh:1-10; none of those are
installable in this environment, so this is a stdlib-ast subset covering the
highest-signal checks).

Checks per module:
  F401  unused import
  F811  redefinition of a top-level function/class
  B006  mutable default argument
  E722  bare except
  F541  f-string without placeholders

Usage: python tools/lint.py [paths...]   (default: yogo_tpu tests tools)
Exit code 1 on any finding.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path


class Checker(ast.NodeVisitor):
    def __init__(self, tree: ast.AST, path: Path):
        self.path = path
        self.problems: list[tuple[int, str]] = []
        self.imports: dict[str, int] = {}  # name -> lineno
        self.used: set[str] = set()
        self.toplevel: dict[str, int] = {}
        self.visit(tree)

    # ------------------------------------------------------------- imports
    def visit_Import(self, node: ast.Import) -> None:
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imports[name] = node.lineno
        self.generic_visit(node)

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        if node.module == "__future__":  # future imports act by existing
            return
        for a in node.names:
            if a.name == "*":
                continue
            self.imports[a.asname or a.name] = node.lineno
        self.generic_visit(node)

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        base = node
        while isinstance(base, ast.Attribute):
            base = base.value
        if isinstance(base, ast.Name):
            self.used.add(base.id)
        self.generic_visit(node)

    # --------------------------------------------------------------- defs
    def _check_def(self, node) -> None:
        if isinstance(getattr(node, "parent", None), ast.Module):
            if node.name in self.toplevel:
                self.problems.append(
                    (node.lineno,
                     f"F811 redefinition of '{node.name}' "
                     f"(first at line {self.toplevel[node.name]})")
                )
            self.toplevel[node.name] = node.lineno

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        self._check_def(node)
        self._check_defaults(node)
        self.generic_visit(node)

    def visit_AsyncFunctionDef(self, node) -> None:
        self._check_def(node)
        self._check_defaults(node)
        self.generic_visit(node)

    def visit_ClassDef(self, node: ast.ClassDef) -> None:
        self._check_def(node)
        self.generic_visit(node)

    def _check_defaults(self, node) -> None:
        for d in list(node.args.defaults) + [
            d for d in node.args.kw_defaults if d is not None
        ]:
            if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                self.problems.append(
                    (d.lineno, "B006 mutable default argument")
                )

    # ------------------------------------------------------------- except
    def visit_ExceptHandler(self, node: ast.ExceptHandler) -> None:
        if node.type is None:
            self.problems.append((node.lineno, "E722 bare except"))
        self.generic_visit(node)

    def visit_JoinedStr(self, node: ast.JoinedStr) -> None:
        # a format_spec is itself a JoinedStr - only flag top-level f-strings
        if not isinstance(getattr(node, "parent", None), ast.FormattedValue):
            if not any(isinstance(v, ast.FormattedValue) for v in node.values):
                self.problems.append(
                    (node.lineno, "F541 f-string without placeholders")
                )
        self.generic_visit(node)

    def finish(self, source: str) -> list[tuple[int, str]]:
        # names quoted on __all__/getattr lines or noqa'd lines are exempt
        lines = source.splitlines()

        def quoted_reexport(name: str) -> bool:
            # only count quoted occurrences on export-ish lines, not in
            # arbitrary strings/docstrings (those hid real unused imports)
            for line in lines:
                if (f'"{name}"' in line or f"'{name}'" in line) and (
                    "__all__" in line or "getattr" in line or "globals(" in line
                ):
                    return True
            return False

        def noqa(line: str) -> bool:
            # require an actual `# noqa` comment, not the substring inside
            # string content
            return "# noqa" in line or "#noqa" in line

        for name, lineno in sorted(self.imports.items()):
            if name in self.used or name == "_":
                continue
            if quoted_reexport(name):
                continue
            line = lines[lineno - 1] if lineno - 1 < len(lines) else ""
            if noqa(line):
                continue
            self.problems.append((lineno, f"F401 unused import '{name}'"))
        return [
            (ln, msg)
            for ln, msg in sorted(self.problems)
            if not noqa(lines[ln - 1] if ln - 1 < len(lines) else "")
        ]


def add_parents(tree: ast.AST) -> None:
    for parent in ast.walk(tree):
        for child in ast.iter_child_nodes(parent):
            child.parent = parent  # type: ignore[attr-defined]


def lint_file(path: Path) -> list[str]:
    source = path.read_text()
    try:
        tree = ast.parse(source, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]
    add_parents(tree)
    checker = Checker(tree, path)
    return [f"{path}:{ln}: {msg}" for ln, msg in checker.finish(source)]


def main(argv: list[str]) -> int:
    roots = [
        Path(p)
        for p in (
            argv
            or ["yogo_tpu", "tests", "tools", "bench.py", "__graft_entry__.py"]
        )
    ]
    problems: list[str] = []
    for root in roots:
        if not root.exists():
            print(f"{root}: path does not exist", file=sys.stderr)
            return 2
        files = [root] if root.is_file() else sorted(root.rglob("*.py"))
        for f in files:
            problems.extend(lint_file(f))
    for p in problems:
        print(p)
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
