"""Verify drives 3+4: CPU 8-dev mesh dryrun + error probes."""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")

import __graft_entry__
__graft_entry__.dryrun_multichip(8)
print("dryrun_multichip(8) OK")

import numpy as np
from tpuvr.config import RenderConfig
from tpuvr.io.synth import smoke_sphere
from tpuvr.ops.geometry import plan_sweep
from tpuvr.ref.camera import OrthoCamera

cam_xy = OrthoCamera(center=(0., 0., 0.), forward=(1.0, 0.0, 0.0),
                     up=(0.0, 0.0, 1.0), width=8.0, height=8.0,
                     res_x=8, res_y=8)
try:
    plan_sweep(cam_xy, (16, 16, 16), 2)  # sweep axis perp to view dir
    print("ERROR: no raise for perpendicular sweep axis")
except ValueError as e:
    print("probe perp-axis raises OK:", str(e)[:60])

from tpuvr.dist.replicated import data_mesh, render_view_dp
from tpuvr.ref.camera import look_at_perspective
mesh = data_mesh(8)
cam_bad = look_at_perspective((40., 2., 9.), (8., 8., 8.),
                              res_x=12, res_y=12)
try:
    render_view_dp(smoke_sphere(16), cam_bad, mesh)
    print("note: rows divisible (probe not triggered)")
except ValueError as e:
    print("probe dp-indivisible raises OK:", str(e)[:60])
print("CPU VERIFY OK")
