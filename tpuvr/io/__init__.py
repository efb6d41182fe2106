"""Volume / image / scene IO and synthetic fixtures."""

from tpuvr.io.synth import orbit_cameras, smoke_sphere  # noqa: F401
