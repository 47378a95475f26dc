"""Packaging surface: pyproject metadata, console-script target, module
entry point — the `ray job submit --runtime-env pip` deploy path
(mirrors the reference's console_scripts: /root/reference/setup.py:58)."""

import subprocess
import sys
import tomllib
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_pyproject_declares_console_script():
    meta = tomllib.loads((ROOT / "pyproject.toml").read_text())
    assert meta["project"]["name"] == "log2seq-ray"
    target = meta["project"]["scripts"]["log2seq-ray"]
    mod, func = target.split(":")
    import importlib
    m = importlib.import_module(mod)
    assert callable(getattr(m, func))


def test_module_entry_point_help():
    out = subprocess.run(
        [sys.executable, "-m", "log2seq_ray", "--help"],
        cwd=ROOT, capture_output=True, text=True)
    assert out.returncode == 0
    assert "--preset" in out.stdout
