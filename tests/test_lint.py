"""The CI lint gate must catch the pyflakes-grade problem classes it claims
to (undefined names, unused imports/locals, broken cross-module imports,
return-annotation drift) — and stay clean on the repo's own idioms."""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from lint import lint_file  # noqa: E402
from scope_lint import ModuleIndex, SignatureIndex  # noqa: E402


def _lint(tmp_path, source, index=None, sig_index=None, module_name=None):
    p = tmp_path / "case.py"
    p.write_text(textwrap.dedent(source))
    return [msg for _, msg in lint_file(str(p), index, sig_index,
                                        module_name)]


def _codes(msgs):
    return {m.split()[0] for m in msgs}


class TestCatchesInjectedProblems:
    def test_undefined_name(self, tmp_path):
        msgs = _lint(tmp_path, """
            def f(x):
                return x + missing_thing
        """)
        assert any(m.startswith("F821") and "missing_thing" in m for m in msgs)

    def test_unused_import(self, tmp_path):
        msgs = _lint(tmp_path, """
            import json
            import os

            print(os.sep)
        """)
        assert any(m.startswith("F401") and "json" in m for m in msgs)

    def test_unused_local(self, tmp_path):
        msgs = _lint(tmp_path, """
            def f(x):
                dead = 3
                return x
        """)
        assert any(m.startswith("F841") and "dead" in m for m in msgs)

    def test_unused_except_name(self, tmp_path):
        msgs = _lint(tmp_path, """
            def f():
                try:
                    return 1
                except ValueError as exc:
                    return 0
        """)
        assert any(m.startswith("F841") and "exc" in m for m in msgs)

    def test_none_annotation_returning_value(self, tmp_path):
        msgs = _lint(tmp_path, """
            def f() -> None:
                return 42
        """)
        assert any(m.startswith("R201") for m in msgs)

    def test_value_annotation_never_returning(self, tmp_path):
        msgs = _lint(tmp_path, """
            def f(a) -> int:
                print(a)
        """)
        assert any(m.startswith("R201") for m in msgs)

    def test_cross_module_missing_name(self, tmp_path):
        index = ModuleIndex([os.path.join(REPO, "allrank_tpu")])
        msgs = _lint(tmp_path, """
            from allrank_tpu.metrics import ndcg, definitely_not_a_metric

            print(ndcg, definitely_not_a_metric)
        """, index)
        assert any(m.startswith("F822") and "definitely_not_a_metric" in m
                   for m in msgs)

    def test_call_signature_checks(self, tmp_path):
        """C901/C902/C903: the arity/keyword subset of mypy, against the
        real repo signatures and same-module defs."""
        sig = SignatureIndex([os.path.join(REPO, "allrank_tpu")])
        msgs = _lint(tmp_path, """
            from allrank_tpu.quant import quantize_dense
            from allrank_tpu.serving import make_scorer
            import allrank_tpu.quant as q


            def local_fn(a, b, *, c=1):
                return a + b + c


            def caller():
                make_scorer(1, 2, 3, 4, 5, 6)
                make_scorer(1, 2, compute_dtyp="bf16")
                quantize_dense()
                q.quantize_model(1, 2, act_scalez={})
                local_fn(1, d=2)
                local_fn(1, 2, c=3)  # fine
        """, sig_index=sig, module_name="case")
        joined = "\n".join(msgs)
        assert "C902 make_scorer() takes 5" in joined
        assert "C901 unexpected keyword 'compute_dtyp'" in joined
        assert "C903 quantize_dense() missing required" in joined
        assert "C901 unexpected keyword 'act_scalez'" in joined
        # same-module defs are indexed when module_name matches the file
        # (the index qualifies modules relative to the root's parent)
        sig2 = SignatureIndex([str(tmp_path)])
        mod2 = f"{os.path.basename(str(tmp_path))}.case"
        msgs2 = _lint(tmp_path, """
            def local_fn(a, b, *, c=1):
                return a + b + c


            def caller():
                local_fn(1, d=2)
        """, sig_index=sig2, module_name=mod2)
        codes2 = _codes(msgs2)
        assert "C901" in codes2 and "C903" in codes2

    def test_module_attr_check(self, tmp_path):
        """C904: typo'd attributes on repo-module aliases, usage-site F822."""
        index = ModuleIndex([os.path.join(REPO, "allrank_tpu")])
        msgs = _lint(tmp_path, """
            import allrank_tpu.quant as q
            from allrank_tpu import metrics


            def use():
                q.quantize_modell(1)
                metrics.ndcgg(1, 2)
                q.quantize_model(1, 2)  # fine
                print(metrics.ndcg)     # fine
        """, index)
        joined = "\n".join(msgs)
        assert "C904 module 'allrank_tpu.quant' has no attribute " \
               "'quantize_modell'" in joined
        assert "C904 module 'allrank_tpu.metrics' has no attribute " \
               "'ndcgg'" in joined

    def test_module_attr_check_skips_rebound_aliases(self, tmp_path):
        index = ModuleIndex([os.path.join(REPO, "allrank_tpu")])
        msgs = _lint(tmp_path, """
            from allrank_tpu import metrics


            def use(metrics):             # parameter shadows the alias
                return metrics.anything_goes
        """, index)
        assert not any(m.startswith("C904") for m in msgs)

    def test_call_signature_skips_unknowable_defs(self, tmp_path):
        """Decorated, conditional, rebound, *args functions and unpacked
        call sites must never be flagged (zero-false-positive contract)."""
        sig = SignatureIndex([str(tmp_path)])
        msgs = _lint(tmp_path, """
            import functools

            try:
                def guarded(a):
                    return a
            except Exception:
                pass


            @functools.lru_cache()
            def decorated(a):
                return a


            def variadic(*args, **kwargs):
                return args, kwargs


            def rebound(a):
                return a


            rebound = variadic


            def caller():
                guarded(1, 2, 3)
                decorated(1, 2, nope=1)
                variadic(1, 2, 3, anything=4)
                rebound(1, 2, 3)
                kw = {}
                variadic(**kw)
        """, sig_index=sig, module_name="case")
        assert not any(m.startswith("C9") for m in msgs)


class TestCleanOnRealIdioms:
    def test_scope_chain_and_comprehensions(self, tmp_path):
        msgs = _lint(tmp_path, """
            import functools


            def outer(items):
                bound = 2

                @functools.lru_cache()
                def inner(k):
                    return k * bound

                pairs = {k: inner(k) for k in items if k > bound}
                total = sum(v for v in pairs.values())
                return [total for _ in range(3)]
        """)
        assert not _codes(msgs) & {"F821", "F841"}, msgs

    def test_class_scope_invisible_to_methods(self, tmp_path):
        msgs = _lint(tmp_path, """
            CONST = 5


            class C:
                attr = CONST

                def m(self):
                    return CONST + self.attr
        """)
        assert "F821" not in _codes(msgs), msgs

    def test_abstract_and_stub_bodies_exempt(self, tmp_path):
        msgs = _lint(tmp_path, """
            import abc


            class B(abc.ABC):
                @abc.abstractmethod
                def f(self) -> int:
                    ...

                def g(self) -> int:
                    raise NotImplementedError
        """)
        assert "R201" not in _codes(msgs), msgs

    def test_walrus_globals_and_augassign(self, tmp_path):
        msgs = _lint(tmp_path, """
            total = 0


            def bump(xs):
                global total
                if (n := len(xs)) > 0:
                    total += n
                return total
        """)
        assert not _codes(msgs) & {"F821", "F841"}, msgs

    def test_walrus_in_comprehension_binds_enclosing_scope(self, tmp_path):
        """PEP 572: an assignment expression inside a comprehension binds
        in the enclosing function scope — using it after the comprehension
        is valid Python and must not raise F821."""
        msgs = _lint(tmp_path, """
            def g(xs):
                total = [y := x + 1 for x in xs]
                return total, y
        """)
        assert "F821" not in _codes(msgs), msgs

    def test_optional_annotation_with_return_none_ok(self, tmp_path):
        """`-> Optional[X]` with an explicit `return None` is correct
        typing, not a missing return value (R201 false positive)."""
        msgs = _lint(tmp_path, """
            from typing import Optional


            def f(flag: bool) -> Optional[int]:
                if flag:
                    return 1
                return None


            def g() -> Optional[int]:
                return None
        """)
        assert not any(m.startswith("R201") for m in msgs), msgs

    def test_star_import_files_skip_f821(self, tmp_path):
        msgs = _lint(tmp_path, """
            from os.path import *  # noqa

            print(join("a", "b"))
        """)
        assert "F821" not in _codes(msgs), msgs


def test_make_ci_gate_fails_on_injected_problem(tmp_path):
    bad = tmp_path / "mod.py"
    bad.write_text("def f():\n    return not_defined_anywhere\n")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lint.py"), str(bad)],
        capture_output=True, text=True,
    )
    assert r.returncode == 1
    assert "F821" in r.stdout


def test_repo_is_lint_clean():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lint.py")],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
