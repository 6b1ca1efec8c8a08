"""Regenerate the API reference (docs/api.md + docs/api/*.md) from docstrings.

docs/api.md is the index: one summary table per subsystem, each symbol
linking into its full entry. docs/api/<group>.md carries the full
reference — signature, complete docstring, and (for classes) the public
method table — the role of the reference's sphinx autodoc site
(/root/reference/docs/source/api.rst) without a sphinx dependency.
"""

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")

import torchdr_tpu as tdr

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "docs")

GROUP_BLURBS = {
    "models": "Estimators: neighbor-embedding and spectral families.",
    "affinity": "Affinity matrices over input data (dense, kNN-sparse, "
                "entropic, doubly-stochastic).",
    "ops": "Numeric core: distances, kNN tiers (exact / IVF / streaming), "
           "reductions, root search, k-means, PQ.",
    "parallel": "SPMD layer: mesh construction, sharded kNN and "
                "symmetrization over `jax.sharding.Mesh`.",
    "eval": "Embedding quality metrics (silhouette, kNN accuracy, "
            "neighborhood preservation, k-means ARI).",
    "utils": "Wrappers, validation, manifolds, optimizers, checkpointing, "
             "profiling, visualization.",
    "affinity_matcher": "The generic affinity-matching optimizer every "
                        "estimator compiles into.",
    "base": "Estimator base class (sklearn-style params, dedup, PRNG).",
    "cli": "Command-line interface.",
}


def anchor(name: str) -> str:
    return name.lower()


def sig_of(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def method_rows(cls) -> list[tuple[str, str]]:
    rows = []
    for mname, m in sorted(vars(cls).items()):
        if mname.startswith("_") or not callable(m):
            continue
        doc = (inspect.getdoc(m) or "").split("\n")[0]
        rows.append((mname, doc))
    return rows


def full_entry(name: str, obj) -> list[str]:
    lines = [f"### {name}", ""]
    if inspect.isclass(obj):
        lines.append(f"```python\nclass {name}{sig_of(obj)}\n```")
    elif callable(obj):
        lines.append(f"```python\n{name}{sig_of(obj)}\n```")
    lines.append("")
    doc = inspect.getdoc(obj)
    if doc:
        lines += [doc, ""]
    if inspect.isclass(obj):
        rows = method_rows(obj)
        if rows:
            lines += ["**Methods**", "", "| method | summary |", "|---|---|"]
            for mname, mdoc in rows:
                lines.append(f"| `{mname}` | {mdoc.replace('|', '│')} |")
            lines.append("")
    return lines


def extra_modules():
    """Public surfaces living under submodules, not re-exported flat."""
    import torchdr_tpu.parallel as P
    import torchdr_tpu.utils.checkpoint as ckpt
    import torchdr_tpu.utils.profiling as prof
    import torchdr_tpu.utils.manifold as man
    import torchdr_tpu.utils.optim as optim
    import torchdr_tpu.utils.visu as visu

    out = []
    for name in P.__all__:
        out.append(("parallel", f"parallel.{name}", getattr(P, name)))
    for mod, label in ((ckpt, "checkpoint"), (prof, "profiling"),
                       (man, "manifold"), (optim, "optim"), (visu, "visu")):
        names = getattr(mod, "__all__", None) or [
            n for n, o in sorted(vars(mod).items())
            if not n.startswith("_") and callable(o)
            and getattr(o, "__module__", "") == mod.__name__
        ]
        for name in names:
            out.append(("utils", f"utils.{label}.{name}", getattr(mod, name)))
    return out


def main():
    groups: dict[str, list[tuple[str, object]]] = {}
    for name in sorted(tdr.__all__):
        obj = getattr(tdr, name)
        mod = getattr(obj, "__module__", "") or ""
        key = mod.split(".")[1] if "." in mod else (mod or "utils")
        groups.setdefault(key, []).append((name, obj))
    for key, name, obj in extra_modules():
        groups.setdefault(key, []).append((name, obj))

    order = ["models", "affinity", "ops", "parallel", "eval", "utils",
             "affinity_matcher", "base", "cli"]
    ordered = [g for g in order if g in groups] + sorted(set(groups) - set(order))

    idx = [
        "# API reference",
        "",
        "Every public symbol of `torchdr_tpu` (auto-generated from docstrings;",
        "regenerate with `python scripts/gen_api_docs.py`). Each symbol links",
        "to its full entry — signature, docstring, methods — under `docs/api/`.",
        "",
    ]
    os.makedirs(os.path.join(ROOT, "api"), exist_ok=True)
    total = 0
    for g in ordered:
        page = [f"# `{g}` — full API", ""]
        if g in GROUP_BLURBS:
            page += [GROUP_BLURBS[g], ""]
        idx += [f"## {g}", ""]
        if g in GROUP_BLURBS:
            idx += [GROUP_BLURBS[g], ""]
        idx += ["| symbol | summary |", "|---|---|"]
        for name, obj in groups[g]:
            doc = (inspect.getdoc(obj) or "").split("\n")[0]
            idx.append(
                f"| [`{name}`](api/{g}.md#{anchor(name)}) |"
                f" {doc.replace('|', '│')} |"
            )
            page += full_entry(name, obj)
            total += 1
        idx.append("")
        with open(os.path.join(ROOT, "api", f"{g}.md"), "w") as f:
            f.write("\n".join(page))
    with open(os.path.join(ROOT, "api.md"), "w") as f:
        f.write("\n".join(idx))
    print("symbols:", total, "groups:", len(ordered))


if __name__ == "__main__":
    main()
