"""Execute every example script as a living test.

The reference's documentation gallery executes its examples on every doc
build (reference: examples/README.rst:1-10, docs/source/conf.py
sphinx-gallery config), which catches example bit-rot. This runner is
the same guarantee without a Sphinx build: each `examples/**/*.py` runs
in a subprocess on a CPU backend with 8 virtual devices (so the
distributed examples exercise real collectives), with `--fast` shrinking
the dataset-sized ones to toy scale for CI.

Run:  python scripts/run_examples.py [--fast] [--match SUBSTR]
Exit: non-zero if any example fails.
"""

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# extra argv per example in --fast mode (examples without a size flag are
# already toy-scale; the distributed ones get --cpu where they support it)
FAST_ARGS = {
    "examples/images/cifar10.py": ["--n", "3000"],
    "examples/single_cell/single_cell.py": ["--n", "3000"],
    "examples/distributed/distributed_umap.py": ["--cpu", "--n", "1024"],
}
ALWAYS_ARGS = {
    "examples/distributed/distributed_umap.py": ["--cpu"],
}


def find_examples():
    out = []
    for dirpath, _, files in os.walk(os.path.join(ROOT, "examples")):
        for f in sorted(files):
            if f.endswith(".py"):
                out.append(os.path.relpath(os.path.join(dirpath, f), ROOT))
    return sorted(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="toy-scale args")
    ap.add_argument("--match", default="", help="only paths containing this")
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    # examples import torchdr_tpu from the repo root
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")

    # A sitecustomize on the PYTHONPATH (TPU harnesses) may re-force
    # JAX_PLATFORMS at interpreter startup, silently putting every example
    # on the one real chip. Force CPU in-process, exactly like
    # tests/conftest.py, then hand control to the example script.
    bootstrap = (
        "import sys, runpy; import jax; "
        "jax.config.update('jax_platforms', 'cpu'); "
        "path = sys.argv[1]; sys.argv = sys.argv[1:]; "
        "runpy.run_path(path, run_name='__main__')"
    )

    failures = []
    examples = [e for e in find_examples() if args.match in e]
    for rel in examples:
        argv = [sys.executable, "-c", bootstrap, os.path.join(ROOT, rel)]
        if args.fast:
            argv += FAST_ARGS.get(rel, ALWAYS_ARGS.get(rel, []))
        else:
            argv += ALWAYS_ARGS.get(rel, [])
        t0 = time.time()
        proc = subprocess.run(
            argv, env=env, cwd=ROOT, capture_output=True, text=True,
            timeout=args.timeout,
        )
        status = "ok" if proc.returncode == 0 else f"FAIL({proc.returncode})"
        print(f"[examples] {rel}: {status} in {time.time() - t0:.1f}s", flush=True)
        if proc.returncode != 0:
            failures.append(rel)
            sys.stderr.write(proc.stdout[-1500:] + "\n" + proc.stderr[-3000:] + "\n")

    print(f"[examples] {len(examples) - len(failures)}/{len(examples)} passed")
    if failures:
        print("[examples] failed: " + ", ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
