"""Import-graph orphan check: every module in the package must be
reachable from production code — imported by another package module, a
repo-root script (bench/driver entry), or be a documented entry point.

Guards against the dead-module pattern the round-3/4 reviews flagged
twice (models/effb2_fused.py, metrics/extra.py): code that exists and
may even be unit-tested, but that no production path can reach."""

import ast
from pathlib import Path

import pytest


REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "audiocaption_tpu"

# Entry points: invoked via `python -m` / public-API imports rather
# than package-internal imports.
ENTRY_POINTS = {
    "audiocaption_tpu.hf_api",        # the public HF-style API surface
}

# Kernels kept with a MEASURED rejection recorded in PERF.md (the
# VERDICT round-4 contract: every Pallas kernel is either load-bearing
# or has a documented on-chip rejection).
MEASURED_REJECTIONS = {
    # 3.3x slower than the XLA MBConv path on chip (PERF.md)
    "audiocaption_tpu.ops.pallas_mbconv",
}


def _module_name(path: Path) -> str:
    rel = path.relative_to(REPO).with_suffix("")
    return ".".join(rel.parts)


def _imports_of(path: Path):
    """Fully-qualified names importable from this file: both module
    paths (import a.b.c / from a.b import c) and attr paths
    (from a.b.c import d -> a.b.c.d could itself be a module)."""
    tree = ast.parse(path.read_text())
    out = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                out.add(a.name)
        elif isinstance(node, ast.ImportFrom) and node.module:
            out.add(node.module)
            for a in node.names:
                out.add(f"{node.module}.{a.name}")
    return out


def test_no_orphan_package_modules():
    sources = (list(PKG.rglob("*.py"))
               + list(REPO.glob("*.py")))          # bench/driver scripts
    imported = set()
    for src in sources:
        imported |= _imports_of(src)

    orphans = []
    for mod_path in PKG.rglob("*.py"):
        name = _module_name(mod_path)
        if mod_path.name == "__init__.py":
            continue
        if name.startswith("audiocaption_tpu.cli."):
            continue                                # python -m entries
        if name in ENTRY_POINTS or name in MEASURED_REJECTIONS:
            continue
        if name not in imported:
            orphans.append(name)

    assert not orphans, (
        f"orphan modules (no production importer): {orphans} — wire "
        "them into a CLI/production path or delete them "
        "(see VERDICT round-4 'padded code')")
