"""Diagnose the compiled on-chip pixel-grad error (VERDICT r4 weak #2).

Measures, against the same f64 CPU oracle as tests/test_tpu_onchip.py:
  - pallas compiled on TPU  (the red number, 3.53e-5)
  - xla impl compiled on TPU (same arithmetic target, no Pallas)
  - pallas interpret on CPU (the 1.56e-5 bench number)
  - xla on CPU
Plus forward-only image error for each, and oracle grad magnitude stats.
"""
import numpy as np
import jax
import jax.numpy as jnp

from tpuvr.io.synth import smoke_sphere
from tpuvr.ops.geometry import intermediate_rays, plan_sweep, ray_dt, \
    slice_coeffs
from tpuvr.ops.vjp import sweep_op
from tpuvr.ref.camera import dominant_axis, look_at_perspective
from tpuvr.ref.march import GRID_PERM, render_plane_sweep

cpu = jax.devices("cpu")[0]
n, res = 24, 32
with jax.default_device(cpu):
    jax.config.update("jax_enable_x64", True)
    grid64 = smoke_sphere(n, dtype=jnp.float64)
    c = (n - 1) / 2.0
    cam = look_at_perspective(
        (c, c - 3.0 * n, c + 0.7 * n), (c, c, c), res_x=res, res_y=res,
    )
    axis = dominant_axis(cam)
    plan, _ = plan_sweep(cam, grid64.shape, axis)
    o, d = intermediate_rays(plan, dtype=jnp.float64)

    def loss64(gp):
        rgb, _ = render_plane_sweep(gp, o, d, axis=2)
        return jnp.sum(rgb)

    gp64 = jnp.transpose(grid64, GRID_PERM[axis])
    rgb64, _ = render_plane_sweep(gp64, o, d, axis=2)
    rgb64 = np.asarray(rgb64)
    g_oracle = np.asarray(jax.grad(loss64)(gp64))
    jax.config.update("jax_enable_x64", False)

print("oracle grad: max abs", np.max(np.abs(g_oracle)),
      "mean abs", np.mean(np.abs(g_oracle)))

grid32 = jnp.asarray(np.asarray(grid64), jnp.float32)
gsc = jnp.transpose(jnp.transpose(grid32, GRID_PERM[axis]), (0, 3, 1, 2))
coeffs = slice_coeffs(plan, jnp.float32)
dt_map = ray_dt(plan, jnp.float32)
enables = jnp.ones((plan.n_planes,), jnp.float32)


def measure(impl, interpret, device):
    op = sweep_op(plan.reverse, 1.0, 0.0, impl, interpret=interpret)

    def loss32(g):
        rgb, _ = op(g, coeffs, enables, dt_map)
        return jnp.sum(rgb)

    def fwd(g):
        return op(g, coeffs, enables, dt_map)[0]

    with jax.default_device(device):
        g_vjp = np.asarray(jax.jit(jax.grad(loss32))(jax.device_put(gsc, device)))
        rgb = np.asarray(jax.jit(fwd)(jax.device_put(gsc, device)))
    gerr = np.max(np.abs(
        np.transpose(g_vjp, (0, 2, 3, 1)).astype(np.float64) - g_oracle))
    ferr = np.max(np.abs(
        np.moveaxis(rgb, 0, -1).astype(np.float64) - rgb64))
    return gerr, ferr


tpu = jax.devices()[0]
for name, impl, interp, dev in [
    ("pallas/TPU compiled", "pallas", None, tpu),
    ("xla/TPU compiled   ", "xla", None, tpu),
    ("pallas/CPU interpret", "pallas", True, cpu),
    ("xla/CPU            ", "xla", None, cpu),
]:
    gerr, ferr = measure(impl, interp, dev)
    print(f"{name}: grad_err {gerr:.4e}  fwd_err {ferr:.4e}")
