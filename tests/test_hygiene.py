"""Hygiene-by-AST tests (reference ``tests/test_handler_logging_hygiene.py``)
plus install-smoke checks (imports resolve, CLI help, no model loads at
import time)."""

import ast
import subprocess
import sys
from pathlib import Path

import pytest

PKG = Path(__file__).resolve().parent.parent / "s2s_tpu"

HANDLER_MODULES = [
    p
    for sub in ("vad", "stt", "llm", "tts", "runtime", "realtime", "pipeline")
    for p in (PKG / sub).glob("*.py")
]


def _calls(tree):
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            yield node


def _call_name(node) -> str:
    f = node.func
    if isinstance(f, ast.Attribute):
        parts = []
        while isinstance(f, ast.Attribute):
            parts.append(f.attr)
            f = f.value
        if isinstance(f, ast.Name):
            parts.append(f.id)
        return ".".join(reversed(parts))
    if isinstance(f, ast.Name):
        return f.id
    return ""


def test_no_print_or_basicconfig_in_handlers():
    """Handlers must use module loggers — no print, no logging.basicConfig
    (the CLI owns logging setup)."""
    offenders = []
    for path in HANDLER_MODULES:
        tree = ast.parse(path.read_text())
        for call in _calls(tree):
            name = _call_name(call)
            if name == "print" or name.endswith("logging.basicConfig"):
                offenders.append(f"{path.relative_to(PKG.parent)}:{call.lineno} {name}")
    assert not offenders, offenders


def test_no_bare_jit_closures_over_params():
    """Guardrail for the remote-compile footgun: no ``jax.jit(lambda ...``
    in model modules (weights must be explicit jit arguments)."""
    offenders = []
    for path in (PKG / "models").glob("*.py"):
        src = path.read_text()
        if "jax.jit(lambda" in src:
            offenders.append(str(path))
    assert not offenders, offenders


def test_all_modules_import():
    import importlib

    for path in PKG.rglob("*.py"):
        rel = path.relative_to(PKG.parent).with_suffix("")
        module = ".".join(rel.parts)
        importlib.import_module(module)


def test_cli_help_fast_and_complete():
    """`s2s-tpu --help` must not load models and must mention the commands."""
    out = subprocess.run(
        [sys.executable, "-m", "s2s_tpu.cli", "--help"],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0
    for word in ("serve", "talk", "local"):
        assert word in out.stdout


def test_default_arguments_importable_without_jax_device():
    """Argument parsing must not touch the accelerator."""
    code = (
        "import sys; sys.modules['jax'] = None\n"
        "from s2s_tpu.arguments import parse_arguments\n"
        "args = parse_arguments([])\n"
        "print(args.module.stt)\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=60)
    assert out.returncode == 0 and "whisper" in out.stdout
