"""Shared scene/camera builders for the driver configs."""

from __future__ import annotations

from tpuvr.ref.camera import OrthoCamera


def smoke_scene(n: int):
    from tpuvr.io.synth import smoke_sphere

    return smoke_sphere(n)


def front_ortho(n: int, res: int) -> OrthoCamera:
    c = (n - 1) / 2.0
    return OrthoCamera(
        center=(c, c, -2.0 * n), forward=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0), width=1.4 * n, height=1.4 * n,
        res_x=res, res_y=res,
    )


def orbit_persp(n: int, res: int):
    from tpuvr.io.synth import orbit_cameras

    return orbit_cameras(1, n, res=res)[0]
