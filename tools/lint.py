"""Dependency-free static lint gate (the reference gates pushes on
ruff+mypy+black, /root/reference/prepush.sh:1-10; none of those are
installable in this environment, so this is a stdlib-ast subset covering the
highest-signal checks).

Checks per module:
  F401  unused import
  F811  redefinition of a top-level function/class
  F821  undefined name (lexical scope tracking; skipped on star-import)
  F841  local variable assigned but never used
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


import builtins

BUILTIN_NAMES = set(dir(builtins)) | {
    "__file__", "__name__", "__doc__", "__builtins__", "__spec__",
    "__package__", "__debug__", "__loader__", "__annotations__", "__path__",
    "__dict__", "__class__", "WindowsError",
}


class Scope:
    """One lexical scope: module, function/lambda, class, or comprehension."""

    def __init__(self, kind: str, parent: "Scope | None"):
        self.kind = kind
        self.parent = parent
        self.children: list[Scope] = []
        self.bindings: set[str] = set()
        # simple `name = value` statement assignments, for F841
        self.simple_assigns: dict[str, int] = {}
        self.loads: list[tuple[str, int]] = []
        self.globals: set[str] = set()
        self.nonlocals: set[str] = set()
        if parent is not None:
            parent.children.append(self)

    def bind(self, name: str) -> None:
        if name in self.globals or name in self.nonlocals:
            return  # the declaration redirects the binding elsewhere
        self.bindings.add(name)

    def function_parent(self) -> "Scope | None":
        s = self.parent
        while s is not None and s.kind not in ("function", "module"):
            s = s.parent
        return s


class ScopeBuilder(ast.NodeVisitor):
    """Builds the scope tree for F821/F841. Mirrors Python's lexical rules:
    class bodies are invisible to nested functions; comprehensions are their
    own scope; walrus binds in the nearest enclosing non-comprehension scope;
    global/nonlocal redirect bindings."""

    def __init__(self, tree: ast.Module):
        self.module = Scope("module", None)
        self.scope = self.module
        self.has_star_import = False
        self.visit(tree)

    # ----------------------------------------------------- scope switching
    def _in_scope(self, scope: Scope, nodes) -> None:
        prev, self.scope = self.scope, scope
        for n in nodes:
            self.visit(n)
        self.scope = prev

    def _visit_function(self, node, name: str | None) -> None:
        if name:
            self.scope.bind(name)
        # decorators, defaults, and annotations evaluate in the DEFINING scope
        for d in getattr(node, "decorator_list", []):
            self.visit(d)
        args = node.args
        for d in list(args.defaults) + [d for d in args.kw_defaults if d]:
            self.visit(d)
        all_args = (
            args.posonlyargs + args.args + args.kwonlyargs
            + ([args.vararg] if args.vararg else [])
            + ([args.kwarg] if args.kwarg else [])
        )
        for a in all_args:
            if a.annotation:
                self.visit(a.annotation)
        if getattr(node, "returns", None):
            self.visit(node.returns)
        inner = Scope("function", self.scope)
        inner.bindings.update(a.arg for a in all_args)
        body = node.body if isinstance(node.body, list) else [node.body]
        self._in_scope(inner, body)

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        self._visit_function(node, node.name)

    def visit_AsyncFunctionDef(self, node) -> None:
        self._visit_function(node, node.name)

    def visit_Lambda(self, node: ast.Lambda) -> None:
        self._visit_function(node, None)

    def visit_ClassDef(self, node: ast.ClassDef) -> None:
        self.scope.bind(node.name)
        for d in node.decorator_list + node.bases + [k.value for k in node.keywords]:
            self.visit(d)
        self._in_scope(Scope("class", self.scope), node.body)

    def _visit_comprehension(self, node, elts) -> None:
        # first iterable evaluates in the enclosing scope
        self.visit(node.generators[0].iter)
        inner = Scope("comprehension", self.scope)
        prev, self.scope = self.scope, inner
        for i, gen in enumerate(node.generators):
            self.visit(gen.target)
            if i > 0:
                self.visit(gen.iter)
            for cond in gen.ifs:
                self.visit(cond)
        for e in elts:
            self.visit(e)
        self.scope = prev

    def visit_ListComp(self, node):
        self._visit_comprehension(node, [node.elt])

    def visit_SetComp(self, node):
        self._visit_comprehension(node, [node.elt])

    def visit_GeneratorExp(self, node):
        self._visit_comprehension(node, [node.elt])

    def visit_DictComp(self, node):
        self._visit_comprehension(node, [node.key, node.value])

    # ------------------------------------------------------------ bindings
    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.scope.loads.append((node.id, node.lineno))
        else:
            self.scope.bind(node.id)

    def visit_NamedExpr(self, node) -> None:  # walrus
        self.visit(node.value)
        s = self.scope
        while s.kind == "comprehension":
            s = s.parent
        s.bind(node.target.id)

    def visit_Assign(self, node: ast.Assign) -> None:
        self.visit(node.value)
        for t in node.targets:
            if isinstance(t, ast.Name):
                self.scope.bind(t.id)
                self.scope.simple_assigns.setdefault(t.id, t.lineno)
            else:
                self.visit(t)

    def visit_AugAssign(self, node: ast.AugAssign) -> None:
        # x += 1 both reads and writes x (pyflakes does not F841 a
        # write-only accumulator that is augmented later)
        self.visit(node.value)
        if isinstance(node.target, ast.Name):
            self.scope.loads.append((node.target.id, node.lineno))
            self.scope.bind(node.target.id)
        else:
            self.visit(node.target)

    def visit_AnnAssign(self, node: ast.AnnAssign) -> None:
        self.visit(node.annotation)
        if node.value:
            self.visit(node.value)
        if isinstance(node.target, ast.Name):
            self.scope.bind(node.target.id)
        else:
            self.visit(node.target)

    def visit_Import(self, node: ast.Import) -> None:
        for a in node.names:
            self.scope.bind((a.asname or a.name).split(".")[0])

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        for a in node.names:
            if a.name == "*":
                self.has_star_import = True
            else:
                self.scope.bind(a.asname or a.name)

    def visit_Global(self, node: ast.Global) -> None:
        self.scope.globals.update(node.names)
        self.module.bindings.update(node.names)

    def visit_Nonlocal(self, node: ast.Nonlocal) -> None:
        self.scope.nonlocals.update(node.names)
        fp = self.scope.function_parent()
        if fp is not None:
            fp.bindings.update(node.names)

    def visit_ExceptHandler(self, node: ast.ExceptHandler) -> None:
        if node.type:
            self.visit(node.type)
        if node.name:
            self.scope.bind(node.name)
        for n in node.body:
            self.visit(n)

    def visit_MatchAs(self, node) -> None:
        if node.pattern:
            self.visit(node.pattern)
        if node.name:
            self.scope.bind(node.name)

    def visit_MatchStar(self, node) -> None:
        if node.name:
            self.scope.bind(node.name)

    def visit_MatchMapping(self, node) -> None:
        self.generic_visit(node)
        if node.rest:
            self.scope.bind(node.rest)


def _resolves(name: str, scope: Scope) -> bool:
    if name in BUILTIN_NAMES:
        return True
    s: Scope | None = scope
    first = True
    while s is not None:
        if s.kind == "class" and not first:
            s = s.parent  # class bodies are invisible to nested scopes
            first = False
            continue
        if name in s.bindings:
            return True
        first = False
        s = s.parent
    return False


def _subtree_loads(scope: Scope, out: set) -> set:
    out.update(n for n, _ in scope.loads)
    for c in scope.children:
        _subtree_loads(c, out)
    return out


def scope_checks(tree: ast.Module) -> list[tuple[int, str]]:
    """F821 undefined name + F841 unused local variable."""
    builder = ScopeBuilder(tree)
    problems: list[tuple[int, str]] = []

    def walk(scope: Scope) -> None:
        if not builder.has_star_import:
            for name, lineno in scope.loads:
                if not _resolves(name, scope):
                    problems.append((lineno, f"F821 undefined name '{name}'"))
        if scope.kind == "function":
            used = _subtree_loads(scope, set())
            for name, lineno in sorted(scope.simple_assigns.items()):
                if (
                    name not in used
                    and not name.startswith("_")
                    and name not in scope.globals
                    and name not in scope.nonlocals
                ):
                    problems.append(
                        (lineno, f"F841 local variable '{name}' never used")
                    )
        for c in scope.children:
            walk(c)

    walk(builder.module)
    return problems


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
    lines = source.splitlines()

    def noqa(ln: int) -> bool:
        line = lines[ln - 1] if ln - 1 < len(lines) else ""
        return "# noqa" in line or "#noqa" in line

    problems = checker.finish(source) + [
        p for p in scope_checks(tree) if not noqa(p[0])
    ]
    return [f"{path}:{ln}: {msg}" for ln, msg in sorted(problems)]


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
