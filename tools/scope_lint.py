"""Scope-aware lint passes (pyflakes-grade, stdlib ast only).

The image has no flake8/pyflakes/mypy, so these passes re-implement the
high-value checks the reference CI gets from them
(reference Makefile lint/mypy targets):

  * F821 undefined name — full scope chain: function -> enclosing
    functions (class bodies are skipped for nested lookups, as in Python)
    -> module -> builtins. Files with a star import are exempt (F403
    already flags those).
  * F841 unused local variable — simple assignments and ``except .. as``
    names bound in a function and never read (``_``-prefixed exempt).
  * F822 cross-module import check — ``from pkg.mod import name`` where
    ``pkg.mod`` is a repo module that defines no top-level ``name`` (and
    ``name`` is not a submodule).
  * R201 annotation consistency — a function annotated ``-> None`` that
    ``return``s a value, and a function with a concrete return annotation
    whose body contains no value-return/yield (stubs, @abstractmethod,
    @overload, and always-raising bodies exempt).

Used by tools/lint.py; ``# noqa`` on the flagged line suppresses.
"""

from __future__ import annotations

import ast
import builtins
import os
from typing import Dict, List, Optional, Set, Tuple

BUILTINS: Set[str] = set(dir(builtins)) | {
    "__file__", "__name__", "__doc__", "__package__", "__spec__",
    "__builtins__", "__debug__", "__loader__", "__path__", "__dict__",
    "__class__",  # implicit cell inside methods using super()/__class__
    "WindowsError",
}

Problem = Tuple[int, str]


class _Scope:
    __slots__ = ("kind", "bindings", "loads", "globals", "nonlocals", "parent")

    def __init__(self, kind: str, parent: Optional["_Scope"]):
        self.kind = kind  # module | function | class | comprehension
        self.bindings: Dict[str, int] = {}
        self.loads: Set[str] = set()
        self.globals: Set[str] = set()
        self.nonlocals: Set[str] = set()
        self.parent = parent


class ScopeChecker(ast.NodeVisitor):
    """One pass collecting bindings + loads per lexical scope, then a
    resolution sweep for F821/F841."""

    def __init__(self, tree: ast.Module):
        self.module_scope = _Scope("module", None)
        self.scope = self.module_scope
        self.has_star_import = False
        # (scope, name, lineno) of every load, resolved after the walk so
        # later bindings in the same scope count (no order checking).
        self.pending_loads: List[Tuple[_Scope, str, int]] = []
        # candidate unused locals: (scope, name, lineno, code)
        self.local_binds: List[Tuple[_Scope, str, int, str]] = []
        self.visit(tree)

    # -- scope plumbing ----------------------------------------------------
    def _push(self, kind: str) -> _Scope:
        self.scope = _Scope(kind, self.scope)
        return self.scope

    def _pop(self) -> None:
        assert self.scope.parent is not None
        self.scope = self.scope.parent

    def _bind(self, name: str, lineno: int) -> None:
        s = self.scope
        if name in s.globals:
            self.module_scope.bindings.setdefault(name, lineno)
            return
        if name in s.nonlocals:
            p = s.parent
            while p is not None and p.kind != "function":
                p = p.parent
            (p or self.module_scope).bindings.setdefault(name, lineno)
            return
        s.bindings.setdefault(name, lineno)

    def _load(self, name: str, lineno: int) -> None:
        self.pending_loads.append((self.scope, name, lineno))
        self.scope.loads.add(name)

    # -- definitions -------------------------------------------------------
    def _visit_func(self, node) -> None:
        self._bind(node.name, node.lineno)
        for d in node.decorator_list:
            self.visit(d)
        args = node.args
        for default in list(args.defaults) + [
            d for d in args.kw_defaults if d is not None
        ]:
            self.visit(default)
        for a in (
            list(args.posonlyargs) + list(args.args) + list(args.kwonlyargs)
            + ([args.vararg] if args.vararg else [])
            + ([args.kwarg] if args.kwarg else [])
        ):
            if a.annotation is not None:
                self.visit(a.annotation)
        if node.returns is not None:
            self.visit(node.returns)
        self._push("function")
        for a in (
            list(args.posonlyargs) + list(args.args) + list(args.kwonlyargs)
            + ([args.vararg] if args.vararg else [])
            + ([args.kwarg] if args.kwarg else [])
        ):
            self._bind(a.arg, node.lineno)
        for stmt in node.body:
            self.visit(stmt)
        self._pop()

    def visit_FunctionDef(self, node):
        self._visit_func(node)

    def visit_AsyncFunctionDef(self, node):
        self._visit_func(node)

    def visit_Lambda(self, node):
        args = node.args
        for default in list(args.defaults) + [
            d for d in args.kw_defaults if d is not None
        ]:
            self.visit(default)
        self._push("function")
        for a in (
            list(args.posonlyargs) + list(args.args) + list(args.kwonlyargs)
            + ([args.vararg] if args.vararg else [])
            + ([args.kwarg] if args.kwarg else [])
        ):
            self._bind(a.arg, node.lineno)
        self.visit(node.body)
        self._pop()

    def visit_ClassDef(self, node):
        self._bind(node.name, node.lineno)
        for d in node.decorator_list:
            self.visit(d)
        for b in node.bases:
            self.visit(b)
        for k in node.keywords:
            self.visit(k.value)
        self._push("class")
        for stmt in node.body:
            self.visit(stmt)
        self._pop()

    # -- imports / declarations ---------------------------------------------
    def visit_Import(self, node):
        for a in node.names:
            self._bind((a.asname or a.name).split(".")[0], node.lineno)

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == "*":
                self.has_star_import = True
                continue
            self._bind(a.asname or a.name, node.lineno)

    def visit_Global(self, node):
        self.scope.globals.update(node.names)

    def visit_Nonlocal(self, node):
        self.scope.nonlocals.update(node.names)

    # -- assignment targets --------------------------------------------------
    def _bind_target(self, target, simple: bool) -> None:
        """simple=True means a lone Name target (F841-eligible)."""
        if isinstance(target, ast.Name):
            self._bind(target.id, target.lineno)
            if simple and self.scope.kind == "function":
                self.local_binds.append(
                    (self.scope, target.id, target.lineno, "F841")
                )
        elif isinstance(target, (ast.Tuple, ast.List)):
            for el in target.elts:
                self._bind_target(el, simple=False)
        elif isinstance(target, ast.Starred):
            self._bind_target(target.value, simple=False)
        else:  # Attribute / Subscript: a load of the base, not a binding
            self.visit(target)

    def visit_Assign(self, node):
        self.visit(node.value)
        simple = len(node.targets) == 1
        for t in node.targets:
            self._bind_target(t, simple=simple and isinstance(t, ast.Name))

    def visit_AnnAssign(self, node):
        self.visit(node.annotation)
        if node.value is not None:
            self.visit(node.value)
        if isinstance(node.target, ast.Name):
            self._bind(node.target.id, node.lineno)
            if node.value is not None and self.scope.kind == "function":
                self.local_binds.append(
                    (self.scope, node.target.id, node.lineno, "F841")
                )
        else:
            self.visit(node.target)

    def visit_AugAssign(self, node):
        self.visit(node.value)
        if isinstance(node.target, ast.Name):
            # an augmented assignment both loads and binds
            self._load(node.target.id, node.lineno)
            self._bind(node.target.id, node.lineno)
        else:
            self.visit(node.target)

    def visit_NamedExpr(self, node):  # walrus
        self.visit(node.value)
        # PEP 572: a walrus inside a comprehension binds in the nearest
        # enclosing non-comprehension scope, not the comprehension's own
        saved = self.scope
        while self.scope.kind == "comprehension":
            self.scope = self.scope.parent
        self._bind(node.target.id, node.lineno)
        self.scope = saved

    def visit_For(self, node):
        self.visit(node.iter)
        self._bind_target(node.target, simple=False)
        for s in node.body:
            self.visit(s)
        for s in node.orelse:
            self.visit(s)

    visit_AsyncFor = visit_For

    def visit_withitem(self, node):
        self.visit(node.context_expr)
        if node.optional_vars is not None:
            self._bind_target(node.optional_vars, simple=False)

    def visit_ExceptHandler(self, node):
        if node.type is not None:
            self.visit(node.type)
        if node.name:
            self._bind(node.name, node.lineno)
            if self.scope.kind == "function":
                self.local_binds.append(
                    (self.scope, node.name, node.lineno, "F841except")
                )
        for s in node.body:
            self.visit(s)

    def visit_MatchAs(self, node):
        if node.pattern is not None:
            self.visit(node.pattern)
        if node.name:
            self._bind(node.name, node.lineno)

    def visit_MatchStar(self, node):
        if node.name:
            self._bind(node.name, node.lineno)

    def visit_MatchMapping(self, node):
        self.generic_visit(node)
        if node.rest:
            self._bind(node.rest, node.lineno)

    # -- comprehensions: own scope in py3 -------------------------------------
    def _visit_comp(self, node, exprs) -> None:
        # first iterable evaluates in the enclosing scope
        self.visit(node.generators[0].iter)
        self._push("comprehension")
        for i, gen in enumerate(node.generators):
            if i > 0:
                self.visit(gen.iter)
            self._bind_target(gen.target, simple=False)
            for cond in gen.ifs:
                self.visit(cond)
        for e in exprs:
            self.visit(e)
        self._pop()

    def visit_ListComp(self, node):
        self._visit_comp(node, [node.elt])

    def visit_SetComp(self, node):
        self._visit_comp(node, [node.elt])

    def visit_GeneratorExp(self, node):
        self._visit_comp(node, [node.elt])

    def visit_DictComp(self, node):
        self._visit_comp(node, [node.key, node.value])

    # -- loads -----------------------------------------------------------------
    def visit_Name(self, node):
        if isinstance(node.ctx, ast.Load):
            self._load(node.id, node.lineno)
        elif isinstance(node.ctx, ast.Del):
            self._load(node.id, node.lineno)

    # -- resolution --------------------------------------------------------------
    def undefined_names(self) -> List[Problem]:
        if self.has_star_import:
            return []
        problems: List[Problem] = []
        seen: Set[Tuple[str, int]] = set()
        for scope, name, lineno in self.pending_loads:
            if name in BUILTINS:
                continue
            s: Optional[_Scope] = scope
            found = False
            first = True
            while s is not None:
                # a class body is invisible to scopes nested inside it
                if s.kind != "class" or first:
                    if name in s.bindings:
                        found = True
                        break
                    if name in s.globals:
                        found = name in self.module_scope.bindings
                        break
                first = False
                s = s.parent
            if not found and (name, lineno) not in seen:
                seen.add((name, lineno))
                problems.append((lineno, f"F821 undefined name '{name}'"))
        return problems

    def unused_locals(self) -> List[Problem]:
        # a name read in any scope NESTED inside its binder counts as used;
        # approximate with "read anywhere in the file under the same name,
        # in this scope or any scope whose chain passes through it".
        reads_by_scope: Dict[int, Set[str]] = {}
        for scope, name, _ in self.pending_loads:
            s: Optional[_Scope] = scope
            while s is not None:
                reads_by_scope.setdefault(id(s), set()).add(name)
                s = s.parent
        problems: List[Problem] = []
        flagged: Set[Tuple[int, str]] = set()
        for scope, name, lineno, code in self.local_binds:
            if name.startswith("_"):
                continue
            if name in scope.globals or name in scope.nonlocals:
                continue
            if name in reads_by_scope.get(id(scope), set()):
                continue
            if (id(scope), name) in flagged:
                continue
            flagged.add((id(scope), name))
            label = (
                "local variable" if code == "F841" else "exception variable"
            )
            problems.append(
                (lineno, f"F841 {label} '{name}' is assigned to but never used")
            )
        return problems


# --------------------------------------------------------------------------
# cross-module import resolution
# --------------------------------------------------------------------------

class ModuleIndex:
    """Top-level binding names per repo module, for F822 checks."""

    def __init__(self, roots: List[str]):
        self.names: Dict[str, Set[str]] = {}
        self.star: Set[str] = set()
        self.packages: Set[str] = set()
        for root in roots:
            base = os.path.basename(os.path.abspath(root))
            parent = os.path.dirname(os.path.abspath(root))
            for dirpath, _dirs, files in os.walk(root):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    path = os.path.join(dirpath, f)
                    rel = os.path.relpath(path, parent)
                    mod = rel[:-3].replace(os.sep, ".")
                    if mod.endswith(".__init__"):
                        mod = mod[: -len(".__init__")]
                        self.packages.add(mod)
                    self._index(path, mod)
            self.packages.add(base)

    def _index(self, path: str, mod: str) -> None:
        try:
            with open(path, encoding="utf-8") as f:
                tree = ast.parse(f.read(), filename=path)
        except (SyntaxError, OSError):
            return
        names: Set[str] = set()
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                names.add(node.name)
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    for el in ast.walk(t):
                        if isinstance(el, ast.Name):
                            names.add(el.id)
            elif isinstance(node, ast.AnnAssign):
                if isinstance(node.target, ast.Name):
                    names.add(node.target.id)
            elif isinstance(node, ast.Import):
                for a in node.names:
                    names.add((a.asname or a.name).split(".")[0])
            elif isinstance(node, ast.ImportFrom):
                for a in node.names:
                    if a.name == "*":
                        self.star.add(mod)
                    else:
                        names.add(a.asname or a.name)
            elif isinstance(node, (ast.If, ast.Try)):
                # common guarded-definition idiom: index both branches
                for sub in ast.walk(node):
                    if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef,
                                        ast.ClassDef)):
                        names.add(sub.name)
                    elif isinstance(sub, ast.Import):
                        for a in sub.names:
                            names.add((a.asname or a.name).split(".")[0])
                    elif isinstance(sub, ast.ImportFrom):
                        for a in sub.names:
                            if a.name != "*":
                                names.add(a.asname or a.name)
                    elif isinstance(sub, ast.Assign):
                        for t in sub.targets:
                            for el in ast.walk(t):
                                if isinstance(el, ast.Name):
                                    names.add(el.id)
        self.names[mod] = names

    def check_import_from(self, module: Optional[str],
                          names: List[ast.alias]) -> List[str]:
        """Return missing names for ``from module import names`` against the
        index; empty when the module is external/starred/unknown."""
        if module is None or module not in self.names:
            return []
        if module in self.star:
            return []
        missing = []
        for a in names:
            if a.name == "*":
                continue
            if a.name in self.names[module]:
                continue
            if f"{module}.{a.name}" in self.names or \
                    f"{module}.{a.name}" in self.packages:
                continue  # importing a submodule
            missing.append(a.name)
        return missing


def check_cross_module(tree: ast.Module, index: ModuleIndex) -> List[Problem]:
    problems: List[Problem] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.level == 0:
            for name in index.check_import_from(node.module, node.names):
                problems.append(
                    (node.lineno,
                     f"F822 '{name}' not found in module '{node.module}'")
                )
        elif isinstance(node, ast.Import):
            for a in node.names:
                top = a.name.split(".")[0]
                if top in index.packages or any(
                    m == top or m.startswith(top + ".") for m in index.names
                ):
                    if a.name not in index.names and \
                            a.name not in index.packages:
                        problems.append(
                            (node.lineno,
                             f"F822 module '{a.name}' not found in repo")
                        )
    return problems


# -----------------------------------------------------------------------------
# minimal annotation consistency
# -----------------------------------------------------------------------------

def _is_none_annotation(node) -> bool:
    return (isinstance(node, ast.Constant) and node.value is None) or (
        isinstance(node, ast.Name) and node.id == "None"
    )


def _annotation_says_no_value(node) -> bool:
    if _is_none_annotation(node):
        return True
    name = None
    if isinstance(node, ast.Name):
        name = node.id
    elif isinstance(node, ast.Attribute):
        name = node.attr
    elif isinstance(node, ast.Constant) and isinstance(node.value, str):
        return node.value in ("None", "NoReturn", "Never")
    return name in ("NoReturn", "Never")


def _body_is_stub(body) -> bool:
    stmts = [
        s for s in body
        if not (isinstance(s, ast.Expr) and isinstance(s.value, ast.Constant))
    ]
    if not stmts:
        return True
    if all(isinstance(s, (ast.Pass, ast.Raise)) for s in stmts):
        return True
    return False


def _decorated_as_stub(node) -> bool:
    for d in node.decorator_list:
        name = d.attr if isinstance(d, ast.Attribute) else (
            d.id if isinstance(d, ast.Name) else None
        )
        if isinstance(d, ast.Call):
            f = d.func
            name = f.attr if isinstance(f, ast.Attribute) else (
                f.id if isinstance(f, ast.Name) else None
            )
        if name in ("abstractmethod", "overload", "abstractproperty"):
            return True
    return False


def check_annotations(tree: ast.Module) -> List[Problem]:
    problems: List[Problem] = []
    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        if node.returns is None:
            continue
        # own-body returns only: don't descend into nested defs
        nested = _nested_nodes(node)
        returns_value = False    # returns something other than literal None
        returns_explicit = False  # any `return <expr>`, incl. `return None`
        has_yield = False
        for sub in ast.walk(node):
            if sub is not node and isinstance(
                sub, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)
            ):
                continue
            if id(sub) in nested:
                continue
            if isinstance(sub, ast.Return) and sub.value is not None:
                returns_explicit = True
                if not (isinstance(sub.value, ast.Constant)
                        and sub.value.value is None):
                    returns_value = True
            if isinstance(sub, (ast.Yield, ast.YieldFrom)):
                has_yield = True
        if _annotation_says_no_value(node.returns):
            if returns_value and not _is_none_annotation(node.returns):
                continue  # NoReturn handled below only for None annotation
            if returns_value:
                problems.append(
                    (node.lineno,
                     f"R201 '{node.name}' is annotated '-> None' but "
                     "returns a value")
                )
        else:
            # an explicit `return None` counts as a deliberate value for a
            # non-None annotation (e.g. `-> Optional[X]` returning None on
            # some or all paths is correct typing)
            if (not returns_value and not returns_explicit and not has_yield
                    and not _body_is_stub(node.body)
                    and not _decorated_as_stub(node)
                    and not _always_raises(node.body)):
                problems.append(
                    (node.lineno,
                     f"R201 '{node.name}' has a return annotation but "
                     "never returns a value")
                )
    return problems


def _always_raises(body) -> bool:
    last = body[-1]
    if isinstance(last, ast.Raise):
        return True
    if isinstance(last, ast.While) and isinstance(
        last.test, ast.Constant
    ) and last.test.value:
        return True  # `while True:` driver loops
    return False


def _nested_nodes(func) -> Set[int]:
    """ids of every node under a def/lambda nested inside ``func``.

    Computed fresh per function — a global id()-keyed cache would collide
    when CPython reuses addresses of collected AST objects across files."""
    inner: Set[int] = set()
    for sub in ast.walk(func):
        if sub is not func and isinstance(
            sub, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)
        ):
            for s2 in ast.walk(sub):
                if s2 is not sub:
                    inner.add(id(s2))
    return inner


# -----------------------------------------------------------------------------
# C90x call-signature checks (the arity/keyword subset of what mypy would
# catch; the image has no mypy and installs are disallowed)
# -----------------------------------------------------------------------------

class _FuncSig:
    __slots__ = ("args", "n_defaults", "kwonly", "kwonly_required",
                 "has_vararg", "has_kwarg")

    def __init__(self, node: ast.FunctionDef):
        a = node.args
        self.args = [p.arg for p in a.posonlyargs + a.args]
        self.n_defaults = len(a.defaults)
        self.kwonly = {p.arg for p in a.kwonlyargs}
        self.kwonly_required = {
            p.arg for p, d in zip(a.kwonlyargs, a.kw_defaults) if d is None
        }
        self.has_vararg = a.vararg is not None
        self.has_kwarg = a.kwarg is not None


class SignatureIndex:
    """Signatures of TOP-LEVEL, UNDECORATED, unconditionally-defined plain
    functions per repo module — the only defs whose call contract is
    knowable statically with zero false-positive risk (decorators change
    signatures; conditional defs differ per branch; rebound names lie)."""

    def __init__(self, roots: List[str]):
        self.sigs: Dict[str, "_FuncSig"] = {}  # "mod.func" -> sig
        for root in roots:
            parent = os.path.dirname(os.path.abspath(root))
            for dirpath, _dirs, files in os.walk(root):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    path = os.path.join(dirpath, f)
                    rel = os.path.relpath(path, parent)
                    mod = rel[:-3].replace(os.sep, ".")
                    if mod.endswith(".__init__"):
                        mod = mod[: -len(".__init__")]
                    self._index(path, mod)

    def _index(self, path: str, mod: str) -> None:
        try:
            with open(path, encoding="utf-8") as f:
                tree = ast.parse(f.read(), filename=path)
        except (SyntaxError, OSError):
            return
        bound: Dict[str, int] = {}
        for node in tree.body:
            if isinstance(node, ast.FunctionDef) and not node.decorator_list:
                bound[node.name] = bound.get(node.name, 0) + 1
            elif isinstance(node, (ast.Assign, ast.AnnAssign, ast.ClassDef,
                                   ast.AsyncFunctionDef)):
                for el in ast.walk(node):
                    if isinstance(el, ast.Name):
                        bound[el.id] = bound.get(el.id, 0) + 9  # disqualify
                if isinstance(node, (ast.ClassDef, ast.AsyncFunctionDef)):
                    bound[node.name] = bound.get(node.name, 0) + 9
        for node in tree.body:
            if (isinstance(node, ast.FunctionDef)
                    and not node.decorator_list
                    and bound.get(node.name) == 1):
                self.sigs[f"{mod}.{node.name}"] = _FuncSig(node)


def check_call_signatures(tree: ast.Module, module: str,
                          index: SignatureIndex) -> List[Problem]:
    """C901 unknown keyword / C902 too many positional / C903 missing
    required argument, for calls that resolve to an indexed repo function
    (direct name via a module-level ``from repo_mod import f`` or this
    module's own top-level def, or ``mod.f`` via ``import repo_mod``).
    Calls with *unpacking are skipped."""
    local: Dict[str, str] = {}    # call name -> "mod.func"
    mod_alias: Dict[str, str] = {}  # local alias -> repo module path
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.level == 0 \
                and node.module:
            for a in node.names:
                q = f"{node.module}.{a.name}"
                if q in index.sigs:
                    local[a.asname or a.name] = q
                # `from pkg import mod` as a module alias
                full = f"{node.module}.{a.name}"
                if any(k.startswith(full + ".") for k in index.sigs):
                    mod_alias[a.asname or a.name] = full
        elif isinstance(node, ast.Import):
            for a in node.names:
                if any(k.startswith(a.name + ".") for k in index.sigs):
                    mod_alias[a.asname or a.name] = a.name
    for node in tree.body:
        if isinstance(node, ast.FunctionDef):
            q = f"{module}.{node.name}"
            if q in index.sigs:
                local[node.name] = q
    # Scope-insensitive shadow collection over the WHOLE tree, not just
    # tree.body: a function-local rebinding (`f = jax.jit(f)`), a
    # parameter, a loop/with/except target, or a nested def sharing an
    # imported repo function's name would otherwise be checked against
    # the repo signature — the zero-false-positive contract says skip.
    shadowed = set()
    top_defs = {n for n in tree.body if isinstance(n, ast.FunctionDef)}

    def _arg_names(a: ast.arguments):
        return (a.posonlyargs + a.args + a.kwonlyargs
                + ([a.vararg] if a.vararg else [])
                + ([a.kwarg] if a.kwarg else []))

    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if not (node in top_defs
                    and f"{module}.{node.name}" in index.sigs):
                shadowed.add(node.name)
            shadowed.update(arg.arg for arg in _arg_names(node.args))
        elif isinstance(node, ast.Lambda):
            shadowed.update(arg.arg for arg in _arg_names(node.args))
        elif isinstance(node, ast.ClassDef):
            shadowed.add(node.name)
        elif isinstance(node, ast.Name) and isinstance(
                node.ctx, (ast.Store, ast.Del)):
            shadowed.add(node.id)
        elif isinstance(node, ast.ExceptHandler) and node.name:
            shadowed.add(node.name)

    problems: List[Problem] = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        target = None
        if isinstance(node.func, ast.Name):
            if node.func.id in shadowed:
                continue
            target = local.get(node.func.id)
        elif isinstance(node.func, ast.Attribute) and isinstance(
                node.func.value, ast.Name):
            if node.func.value.id in shadowed:  # module alias rebound
                continue
            base = mod_alias.get(node.func.value.id)
            if base is not None:
                target = f"{base}.{node.func.attr}"
                if target not in index.sigs:
                    target = None
        if target is None:
            continue
        if any(isinstance(a, ast.Starred) for a in node.args) or any(
                kw.arg is None for kw in node.keywords):
            continue  # *args/**kwargs unpacking at the call site
        sig = index.sigs[target]
        fname = target.rsplit(".", 1)[1]
        kwnames = [kw.arg for kw in node.keywords]
        for kw in kwnames:
            if (kw not in sig.args and kw not in sig.kwonly
                    and not sig.has_kwarg):
                problems.append(
                    (node.lineno,
                     f"C901 unexpected keyword '{kw}' in call to "
                     f"{fname}()"))
        if len(node.args) > len(sig.args) and not sig.has_vararg:
            problems.append(
                (node.lineno,
                 f"C902 {fname}() takes {len(sig.args)} positional "
                 f"argument(s) but {len(node.args)} given"))
        required = set(sig.args[: len(sig.args) - sig.n_defaults])
        required |= sig.kwonly_required
        supplied = set(sig.args[: len(node.args)]) | set(kwnames)
        missing = required - supplied
        if missing and not sig.has_vararg:
            problems.append(
                (node.lineno,
                 f"C903 {fname}() missing required argument(s): "
                 f"{', '.join(sorted(missing))}"))
    return problems


def check_module_attrs(tree: ast.Module, index: ModuleIndex) -> List[Problem]:
    """C904: ``alias.attr`` where ``alias`` is a repo module imported at
    module level and ``attr`` is not a top-level binding of that module —
    the usage-site sibling of F822 (catches typo'd module attributes that
    only fail at runtime). Star-importing modules and submodule access are
    exempt; so is any alias rebound in this file."""
    alias_to_mod: Dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name in index.names:
                    alias_to_mod[a.asname or a.name.split(".")[0]] = (
                        a.name if a.asname else a.name.split(".")[0])
                    if a.asname:
                        alias_to_mod[a.asname] = a.name
        elif isinstance(node, ast.ImportFrom) and node.level == 0 \
                and node.module:
            for a in node.names:
                full = f"{node.module}.{a.name}"
                if full in index.names:
                    alias_to_mod[a.asname or a.name] = full
    if not alias_to_mod:
        return []
    # drop aliases that are rebound anywhere in the file (params, locals,
    # assignments) — attribute checks on those would be guesses
    rebound: Set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.Lambda)):
            a = node.args
            for p in a.posonlyargs + a.args + a.kwonlyargs:
                rebound.add(p.arg)
            if a.vararg:
                rebound.add(a.vararg.arg)
            if a.kwarg:
                rebound.add(a.kwarg.arg)
        elif isinstance(node, (ast.Assign, ast.AnnAssign, ast.AugAssign,
                               ast.For, ast.withitem, ast.comprehension)):
            targets = []
            if isinstance(node, ast.Assign):
                targets = node.targets
            elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
                targets = [node.target]
            elif isinstance(node, ast.For):
                targets = [node.target]
            elif isinstance(node, ast.withitem):
                targets = [node.optional_vars] if node.optional_vars else []
            else:
                targets = [node.target]
            for t in targets:
                for el in ast.walk(t):
                    if isinstance(el, ast.Name):
                        rebound.add(el.id)
    problems: List[Problem] = []
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Attribute)
                and isinstance(node.value, ast.Name)):
            continue
        alias = node.value.id
        mod = alias_to_mod.get(alias)
        if mod is None or alias in rebound or mod not in index.names:
            continue
        if mod in index.star:
            continue
        attr = node.attr
        if attr.startswith("__"):
            continue
        if attr in index.names[mod]:
            continue
        if f"{mod}.{attr}" in index.names or f"{mod}.{attr}" in index.packages:
            continue  # submodule access
        problems.append(
            (node.lineno,
             f"C904 module '{mod}' has no attribute '{attr}'"))
    return problems
