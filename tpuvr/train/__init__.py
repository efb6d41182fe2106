"""Inverse rendering: Adam on the voxel grid from posed views (C9)."""

from tpuvr.train.fit import fit_grid, render_all_views  # noqa: F401
