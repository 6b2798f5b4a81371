"""Stdlib lint for CI — the image has no flake8/mypy and installs are
disallowed, so this enforces a meaningful subset with ast/tokenize alone
(and actually FAILS the build, unlike a `|| true` target):

  * E9   syntax errors (ast.parse)
  * E501 line length > MAX_LINE
  * W291 trailing whitespace / W191 tabs in indentation
  * F401 unused module-level imports (respects ``# noqa`` on the line)
  * F403 star imports
  * F811 duplicate top-level definitions
  * F821 undefined names (scope-aware, tools/scope_lint.py)
  * F841 unused local variables
  * F822 cross-module from-imports naming things the target module lacks
  * R201 return-annotation consistency (minimal)

Usage: ``python tools/lint.py [paths...]`` (default: allrank_tpu tests tools).
Exit code 1 on any finding.
"""

from __future__ import annotations

import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scope_lint import (  # noqa: E402
    ModuleIndex,
    ScopeChecker,
    SignatureIndex,
    check_annotations,
    check_call_signatures,
    check_cross_module,
    check_module_attrs,
)

MAX_LINE = 120


def _iter_py(paths):
    for p in paths:
        if os.path.isfile(p) and p.endswith(".py"):
            yield p
        elif os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in sorted(files):
                    if f.endswith(".py"):
                        yield os.path.join(root, f)


def _noqa_lines(src: str):
    return {
        i + 1
        for i, line in enumerate(src.splitlines())
        if "# noqa" in line or "#noqa" in line
    }


class _ImportUsage(ast.NodeVisitor):
    """Collect module-level imported names and every name usage."""

    def __init__(self):
        self.imports = {}  # name -> (lineno, display)
        self.used = set()

    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imports[name] = (node.lineno, a.name)

    def visit_ImportFrom(self, node):
        if node.module == "__future__":
            return  # compiler directives, not names
        for a in node.names:
            if a.name == "*":
                continue
            name = a.asname or a.name
            self.imports[name] = (node.lineno, f"{node.module}.{a.name}")

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def lint_file(path: str, index=None, sig_index=None,
              module_name=None):
    problems = []
    with open(path, encoding="utf-8") as f:
        src = f.read()
    noqa = _noqa_lines(src)

    for i, line in enumerate(src.splitlines(), start=1):
        if i in noqa:
            continue
        if len(line) > MAX_LINE:
            problems.append((i, f"E501 line too long ({len(line)} > {MAX_LINE})"))
        if line != line.rstrip():
            problems.append((i, "W291 trailing whitespace"))
        stripped_len = len(line) - len(line.lstrip("\t "))
        if "\t" in line[:stripped_len]:
            problems.append((i, "W191 tab in indentation"))

    try:
        tree = ast.parse(src, filename=path)
    except SyntaxError as e:
        problems.append((e.lineno or 0, f"E999 syntax error: {e.msg}"))
        return problems

    # star imports + duplicate top-level defs
    top_defs = {}
    for node in tree.body:
        if isinstance(node, ast.ImportFrom) and any(
            a.name == "*" for a in node.names
        ):
            if node.lineno not in noqa:
                problems.append(
                    (node.lineno, f"F403 star import from {node.module}")
                )
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in top_defs and node.lineno not in noqa:
                problems.append(
                    (node.lineno,
                     f"F811 redefinition of '{node.name}' "
                     f"(first at line {top_defs[node.name]})")
                )
            top_defs.setdefault(node.name, node.lineno)

    # unused module-level imports
    usage = _ImportUsage()
    usage.visit(tree)
    # names referenced inside __all__ strings count as used
    for node in tree.body:
        if isinstance(node, ast.Assign) and any(
            isinstance(t, ast.Name) and t.id == "__all__" for t in node.targets
        ):
            for el in ast.walk(node.value):
                if isinstance(el, ast.Constant) and isinstance(el.value, str):
                    usage.used.add(el.value)
    for name, (lineno, display) in usage.imports.items():
        if lineno in noqa:
            continue
        if name not in usage.used and not name.startswith("_"):
            # string-annotation / doctest references are rare here; keep strict
            if name not in src.replace(f"import {name}", "", 1):
                problems.append((lineno, f"F401 '{display}' imported but unused"))

    # scope-aware passes (pyflakes-grade)
    checker = ScopeChecker(tree)
    scoped = checker.undefined_names() + checker.unused_locals()
    scoped += check_annotations(tree)
    if index is not None:
        scoped += check_cross_module(tree, index)
        scoped += check_module_attrs(tree, index)
    if sig_index is not None:
        scoped += check_call_signatures(tree, module_name or "", sig_index)
    problems.extend((ln, msg) for ln, msg in scoped if ln not in noqa)
    return problems


def main() -> int:
    paths = sys.argv[1:] or ["allrank_tpu", "tests", "tools"]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_root = os.path.join(repo_root, "allrank_tpu")
    index = ModuleIndex([pkg_root]) if os.path.isdir(pkg_root) else None
    sig_index = (SignatureIndex([pkg_root])
                 if os.path.isdir(pkg_root) else None)
    n = 0
    for path in _iter_py(paths):
        rel = os.path.relpath(os.path.abspath(path), repo_root)
        module_name = rel[:-3].replace(os.sep, ".") if rel.endswith(".py") \
            else None
        for lineno, msg in sorted(lint_file(path, index, sig_index,
                                            module_name)):
            print(f"{path}:{lineno}: {msg}")
            n += 1
    if n:
        print(f"{n} problem(s)")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
