"""REGISTRY.md is generated from the live registry — this guard
fails when a registration lands without re-running
tools/gen_registry_md.py, keeping the index trustworthy."""

from __future__ import annotations

import os


def test_registry_md_matches_live_registry():
    import importlib.util

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_registry_md", os.path.join(here, "tools", "gen_registry_md.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with open(os.path.join(here, "REGISTRY.md")) as fh:
        on_disk = fh.read()
    assert on_disk == mod.render(), (
        "REGISTRY.md is stale — run: python tools/gen_registry_md.py"
    )
