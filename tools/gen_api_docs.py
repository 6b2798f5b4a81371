"""Generate docs/API.md: the public API surface with signatures and
docstring summaries, extracted from the live modules (so it cannot drift
silently — regenerate with `python tools/gen_api_docs.py`; `make docs`).
"""

from __future__ import annotations

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

MODULES = [
    ("Configuration", ["allrank_tpu.config"]),
    ("Data pipeline", [
        "allrank_tpu.data.dataset",
        "allrank_tpu.data.batching",
        "allrank_tpu.data.slate_fixing",
        "allrank_tpu.data.feature_store",
        "allrank_tpu.data.saving",
        "allrank_tpu.data.dummy",
        "allrank_tpu.data.validate",
    ]),
    ("Models", [
        "allrank_tpu.models.factory",
        "allrank_tpu.models.transformer",
        "allrank_tpu.models.core",
        "allrank_tpu.models.positional",
    ]),
    ("Losses", ["allrank_tpu.losses"]),
    ("Metrics", ["allrank_tpu.metrics"]),
    ("Training", [
        "allrank_tpu.training.train_utils",
        "allrank_tpu.training.optimizers",
        "allrank_tpu.training.schedulers",
        "allrank_tpu.training.early_stop",
        "allrank_tpu.training.checkpoint",
    ]),
    ("Parallelism", ["allrank_tpu.parallel.mesh", "allrank_tpu.parallel"]),
    ("Inference & click models", [
        "allrank_tpu.inference.inference_utils",
        "allrank_tpu.click_models.base",
        "allrank_tpu.click_models.cascade_models",
        "allrank_tpu.click_models.duplicate_aware",
        "allrank_tpu.click_models.jax_models",
        "allrank_tpu.click_models.click_utils",
    ]),
    ("Serving", [
        "allrank_tpu.serving",
        "allrank_tpu.serve_http",
        "allrank_tpu.quant",
    ]),
    ("Interop & checkpoint import", ["allrank_tpu.interop"]),
]

CLIS = [
    ("python -m allrank_tpu.main", "allrank_tpu.main",
     "train a config end-to-end (job-dir/run-id/config-file-name)"),
    ("python -m allrank_tpu.evaluate", "allrank_tpu.evaluate",
     "score a checkpoint on any roles offline (+ --quantize int8)"),
    ("python -m allrank_tpu.rank_and_click", "allrank_tpu.rank_and_click",
     "re-rank datasets with a trained model and simulate click models"),
    ("python -m allrank_tpu.serve_http", "allrank_tpu.serve_http",
     "dynamic-batching HTTP scoring service"),
    ("python -m allrank_tpu.data.dummy", "allrank_tpu.data.dummy",
     "generate a dummy svmlight dataset"),
    ("python -m allrank_tpu.data.validate", "allrank_tpu.data.validate",
     "pre-flight dataset checks (NaN/Inf, dim mismatch, qid contiguity, label sanity)"),
]


def first_paragraph(doc: str | None) -> str:
    if not doc:
        return ""
    para = doc.strip().split("\n\n")[0]
    return " ".join(line.strip() for line in para.splitlines())


def signature_of(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def public_members(mod):
    names = getattr(mod, "__all__", None)
    for name in names or sorted(vars(mod)):
        if name.startswith("_"):
            continue
        obj = getattr(mod, name, None)
        if inspect.ismodule(obj) or obj is None:
            continue
        defined_here = getattr(obj, "__module__", None) == mod.__name__
        if not (names or defined_here):
            continue
        if inspect.isfunction(obj) or inspect.isclass(obj):
            yield name, obj


def main() -> None:
    out = ["# API reference",
           "",
           "Generated from the live modules by `tools/gen_api_docs.py` "
           "(`make docs`) — regenerate after changing public signatures.",
           "",
           "## Command-line entry points",
           ""]
    for cmd, modname, blurb in CLIS:
        out.append(f"- **`{cmd}`** — {blurb}")
    out.append("")

    for section, modnames in MODULES:
        out.append(f"## {section}")
        out.append("")
        for modname in modnames:
            mod = importlib.import_module(modname)
            members = list(public_members(mod))
            if not members:
                continue
            out.append(f"### `{modname}`")
            head = first_paragraph(mod.__doc__)
            if head:
                out.append("")
                out.append(head)
            out.append("")
            for name, obj in members:
                kind = "class" if inspect.isclass(obj) else "def"
                sig = signature_of(obj)
                out.append(f"- **`{kind} {name}{sig}`**")
                doc = first_paragraph(inspect.getdoc(obj))
                # drop auto-generated dataclass reprs and inherited
                # boilerplate (they just repeat the signature)
                if doc and not doc.startswith(f"{name}(") \
                        and "base class for all non-exit" not in doc:
                    out.append(f"  — {doc}")
            out.append("")

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "API.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path} ({len(out)} lines)")


if __name__ == "__main__":
    main()
