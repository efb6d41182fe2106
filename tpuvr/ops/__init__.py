"""Differentiable render ops: camera-facing API over the Pallas kernels."""

from tpuvr.ops.render import (  # noqa: F401
    prepare_grid,
    render,
    render_prepared,
    render_view,
)
