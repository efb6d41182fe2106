"""The five driver configs (BASELINE.json:6-12), importable by name."""

import importlib


def load(name: str):
    """Load configs.c1 .. configs.c5 and return its CONFIG dict."""
    mod = importlib.import_module(f"configs.{name}")
    return mod.CONFIG
