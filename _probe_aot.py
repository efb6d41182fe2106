"""AOT-lower the ring backward for a deviceless v5e:2x4 topology."""
import os, sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuvr.io.synth import smoke_sphere
from tpuvr.kernels.ring_bwd import sweep_bwd_ring
from tpuvr.kernels.sweep import sweep_fwd
from tpuvr.ops.geometry import plan_sweep, plan_valid_mask, ray_dt, \
    slice_coeffs
from tpuvr.ops.render import grid_to_sweep_layout, slice_enables
from tpuvr.ref.camera import OrthoCamera, dominant_axis

topo = topologies.get_topology_desc(platform="tpu",
                                    topology_name="v5e:2x4")
mesh = Mesh(np.asarray(topo.devices).reshape(8), ("data",))
D = 8
N, RES = 128, 128
c = (N - 1) / 2.0
cam = OrthoCamera(center=(c, c, -2.0 * N), forward=(0.0, 0.0, 1.0),
                  up=(0.0, 1.0, 0.0), width=1.3 * N, height=1.3 * N,
                  res_x=RES, res_y=RES)
axis = dominant_axis(cam)
plan, _ = plan_sweep(cam, (N, N, N), axis)
n_v, n_u = plan.n_v, plan.n_u
rows_local = n_v // D
kw = dict(reverse=plan.reverse, sigma_scale=1.0, early_stop_eps=0.0,
          precision="default")


def absx(shape, dtype=jnp.float32, spec=P()):
    return jax.ShapeDtypeStruct(shape, dtype,
                                sharding=NamedSharding(mesh, spec))


def body(grid_sc, ay, by, ax, bx, enables, dt_t, dC_t, dT_t):
    row_off = (jax.lax.axis_index("data") * rows_local).astype(
        jnp.float32)
    cfs = (ay, by + row_off * ay, ax, bx)
    rgb, trans = sweep_fwd(grid_sc, cfs, enables, dt_t, **kw)
    return sweep_bwd_ring(
        grid_sc, cfs, enables, dt_t, rgb, trans, dC_t, dT_t,
        ring_axis="data", ring_size=D, ring_chunks=4, **kw,
    )


fn = jax.jit(jax.shard_map(
    body, mesh=mesh,
    in_specs=(P(), P(), P(), P(), P(), P(), P("data", None),
              P(None, "data", None), P("data", None)),
    out_specs=P(),
    check_vma=False,
))
args = (
    absx((N, 4, N, N)),
    absx((N,)), absx((N,)), absx((N,)), absx((N,)), absx((N,)),
    absx((n_v, n_u), spec=P("data", None)),
    absx((3, n_v, n_u), spec=P(None, "data", None)),
    absx((n_v, n_u), spec=P("data", None)),
)
compiled = fn.lower(*args).compile()
txt = compiled.as_text()
n_ar = sum(1 for l in txt.splitlines() if "all-reduce" in l)
n_cc = sum(1 for l in txt.splitlines()
           if "tpu_custom_call" in l and "=" in l)
print(f"AOT OK: {n_cc} custom-call lines, {n_ar} all-reduce lines")
print("FLOPS estimate:", compiled.cost_analysis().get("flops", "?"))
