"""CLI tests (mirrors reference test_cli.py scope, without torchrun mocking)."""

import subprocess
import sys

import pytest


def test_info_command():
    out = subprocess.run(
        [sys.executable, "-m", "torchdr_tpu.cli", "info"],
        capture_output=True, text=True, timeout=120,
        cwd="/root/repo",
    )
    assert out.returncode == 0
    assert "devices:" in out.stdout


def test_run_command(tmp_path):
    script = tmp_path / "s.py"
    script.write_text("print('HELLO_FROM_SCRIPT')\n")
    out = subprocess.run(
        [
            sys.executable, "-m", "torchdr_tpu.cli", "run", str(script),
            "--virtual-cpu-devices", "4",
        ],
        capture_output=True, text=True, timeout=120,
        cwd="/root/repo",
    )
    assert out.returncode == 0
    assert "HELLO_FROM_SCRIPT" in out.stdout


def test_no_command_shows_help():
    out = subprocess.run(
        [sys.executable, "-m", "torchdr_tpu.cli"],
        capture_output=True, text=True, timeout=60,
        cwd="/root/repo",
    )
    assert out.returncode == 1
    assert "usage" in out.stdout.lower()
