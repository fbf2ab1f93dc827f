"""The linter must catch injected errors (VERDICT r2 weak #4: prove F821
catches a real NameError on a rarely-executed branch) and must stay quiet on
the legitimate scoping patterns the codebase uses."""

import ast
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from lint import lint_file, scope_checks  # noqa: E402


def _codes(src: str) -> list[str]:
    tree = ast.parse(src)
    return [msg.split()[0] for _, msg in scope_checks(tree)]


def _lint_src(tmp_path, src: str) -> list[str]:
    p = tmp_path / "mod.py"
    p.write_text(src)
    return lint_file(p)


# ------------------------------------------------------------------ F821


def test_f821_catches_namerror_on_rare_branch(tmp_path):
    src = (
        "def handler(x):\n"
        "    if x > 1000:\n"
        "        return undefined_helper(x)\n"
        "    return x\n"
    )
    probs = _lint_src(tmp_path, src)
    assert any("F821" in p and "undefined_helper" in p for p in probs)


def test_f821_typo_in_except_branch():
    src = (
        "import json\n"
        "def load(path):\n"
        "    try:\n"
        "        return json.loads(path)\n"
        "    except ValueError as e:\n"
        "        raise RuntimeError(strr(e))\n"
    )
    assert "F821" in _codes(src)


def test_f821_clean_on_forward_reference():
    # module-level names defined AFTER use inside a function are fine
    src = "def f():\n    return g()\n\ndef g():\n    return 1\n"
    assert "F821" not in _codes(src)


def test_f821_clean_on_closure_and_comprehension():
    src = (
        "def outer(items):\n"
        "    n = len(items)\n"
        "    doubled = [x * n for x in items]\n"
        "    def inner():\n"
        "        return n + sum(doubled)\n"
        "    return inner\n"
    )
    assert "F821" not in _codes(src)


def test_f821_comprehension_var_not_leaked():
    src = "def f(items):\n    [y for y in items]\n    return y\n"
    assert "F821" in _codes(src)


def test_f821_class_scope_invisible_to_methods():
    # class-level names are NOT in scope inside methods (real NameError)
    src = (
        "class C:\n"
        "    table = {1: 2}\n"
        "    def get(self):\n"
        "        return table\n"
    )
    assert "F821" in _codes(src)


def test_f821_class_scope_visible_in_body():
    src = "class C:\n    table = {1: 2}\n    size = len(table)\n"
    assert "F821" not in _codes(src)


def test_f821_walrus_and_global():
    src = (
        "_cache = None\n"
        "def get():\n"
        "    global _cache\n"
        "    if (v := _cache) is None:\n"
        "        _cache = v = 42\n"
        "    return v\n"
    )
    assert "F821" not in _codes(src)


def test_f821_suppressed_by_star_import():
    src = "from os.path import *\n\ndef f(p):\n    return join(p, 'x')\n"
    assert "F821" not in _codes(src)


def test_f821_decorator_and_default_in_defining_scope():
    src = (
        "import functools\n"
        "@functools.lru_cache\n"
        "def f(x, y=missing_default):\n"
        "    return x\n"
    )
    assert "F821" in _codes(src)


# ------------------------------------------------------------------ F841


def test_f841_unused_local(tmp_path):
    src = "def f(x):\n    result = x + 1\n    return x\n"
    probs = _lint_src(tmp_path, src)
    assert any("F841" in p and "result" in p for p in probs)


def test_f841_clean_cases():
    src = (
        "def f(xs):\n"
        "    _ignored = xs.pop()\n"          # underscore convention
        "    total = 0\n"
        "    for x in xs:\n"                  # loop targets not flagged
        "        total += x\n"
        "    def g():\n"
        "        return total\n"              # closure use counts
        "    a, b = xs[:2]\n"                 # tuple unpacking not flagged
        "    return g() + a\n"
    )
    assert "F841" not in _codes(src)


# --------------------------------------------------- end-to-end + repo gate


def test_linter_cli_flags_injected_file(tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text("def f():\n    return undefined_name\n")
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "lint.py"), str(bad)],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 1
    assert "F821" in r.stdout


def test_repo_is_lint_clean():
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "lint.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_f841_augassign_counts_as_use():
    # pyflakes does not flag a write-only accumulator that is augmented
    # (x += 1 reads x; the scope model tracks the read, not statement order)
    src = "def f():\n    x = 0\n    x += 1\n"
    assert "F841" not in _codes(src)
    assert "F821" not in _codes(src)
