"""Regenerate docs/api.md from the public API's docstrings."""

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")

import torchdr_tpu as tdr


def main():
    groups = {}
    for name in sorted(tdr.__all__):
        obj = getattr(tdr, name)
        mod = getattr(obj, "__module__", "") or ""
        doc = (inspect.getdoc(obj) or "").split("\n")[0]
        key = mod.split(".")[1] if "." in mod else mod
        groups.setdefault(key, []).append((name, doc))

    lines = [
        "# API reference",
        "",
        "Every public symbol of `torchdr_tpu` (auto-generated from docstrings;",
        "regenerate with `python scripts/gen_api_docs.py`).",
        "",
    ]
    order = ["models", "affinity", "ops", "parallel", "eval", "utils",
             "affinity_matcher", "base", "cli"]
    seen = set()
    for g in order + sorted(set(groups) - set(order)):
        if g not in groups or g in seen:
            continue
        seen.add(g)
        lines += [f"## {g}", "", "| symbol | summary |", "|---|---|"]
        for name, doc in groups[g]:
            lines.append(f"| `{name}` | {doc.replace('|', '\\|')} |")
        lines.append("")
    with open(os.path.join(os.path.dirname(__file__), "..", "docs", "api.md"), "w") as f:
        f.write("\n".join(lines))
    print("symbols:", sum(len(v) for v in groups.values()))


if __name__ == "__main__":
    main()
