"""Differentiable render ops: camera-facing API over the Pallas kernels."""

from tpuvr.ops.render import render, render_view  # noqa: F401
