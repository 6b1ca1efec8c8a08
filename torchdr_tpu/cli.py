"""Command-line runner.

The reference CLI wraps ``torchrun --standalone --nproc_per_node=N``
(reference: torchdr/cli.py:24-135). On TPU there is no process launcher:
one process drives all local chips SPMD. The CLI therefore reduces to a
thin runner that configures the mesh (device count / virtual CPU devices
for testing) and execs the user's script — plus a ``bench`` subcommand.
"""

from __future__ import annotations

import argparse
import os
import runpy
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="torchdr-tpu",
        description="TPU-native dimensionality reduction runner.",
    )
    sub = parser.add_subparsers(dest="command")

    run_p = sub.add_parser("run", help="Run a script with mesh configuration.")
    run_p.add_argument("script", help="Python script to execute.")
    run_p.add_argument(
        "--n-devices",
        type=int,
        default=None,
        help="Limit the mesh to this many devices (default: all).",
    )
    run_p.add_argument(
        "--virtual-cpu-devices",
        type=int,
        default=None,
        help="Force N virtual CPU devices (testing without TPU hardware).",
    )
    run_p.add_argument("script_args", nargs=argparse.REMAINDER)

    info_p = sub.add_parser("info", help="Print device/mesh information.")

    bench_p = sub.add_parser(
        "bench", help="Run the repo headline benchmark (bench.py)."
    )
    bench_p.add_argument(
        "--path",
        default=None,
        help="Path to a bench script (default: bench.py next to the package root, "
        "then ./bench.py).",
    )

    args = parser.parse_args(argv)

    if args.command == "info":
        import jax

        print(f"jax {jax.__version__}")
        print(f"devices: {jax.devices()}")
        return 0

    if args.command == "bench":
        if args.path:
            # An explicit path is authoritative: do not fall back silently.
            candidates = [args.path]
        else:
            here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            candidates = [
                os.path.join(here, "bench.py"),
                os.path.join(os.getcwd(), "bench.py"),
            ]
        for cand in candidates:
            if cand and os.path.isfile(cand):
                sys.argv = [cand]
                runpy.run_path(cand, run_name="__main__")
                return 0
        print("bench.py not found; pass --path", file=sys.stderr)
        return 1

    if args.command == "run":
        if args.virtual_cpu_devices:
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={args.virtual_cpu_devices}"
            ).strip()
            os.environ["TORCHDR_TPU_FORCE_CPU"] = "1"
        if args.n_devices:
            os.environ["TORCHDR_TPU_N_DEVICES"] = str(args.n_devices)
        sys.argv = [args.script] + list(args.script_args)
        runpy.run_path(args.script, run_name="__main__")
        return 0

    parser.print_help()
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
