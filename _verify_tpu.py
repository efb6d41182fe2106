"""Verify drive 1+2: TPU Pallas render via public API + gradient flow."""
import numpy as np
import jax
import jax.numpy as jnp

from tpuvr.config import RenderConfig
from tpuvr.io.synth import smoke_sphere
from tpuvr.io.image import write_png
from tpuvr.ref.camera import OrthoCamera, look_at_perspective
from tpuvr.ops.render import render_view

grid = smoke_sphere(64)
c = 31.5
cam = look_at_perspective((c, c - 3 * 64, c + 0.6 * 64), (c, c, c),
                          res_x=128, res_y=128)
cfg = RenderConfig(early_stop_eps=1e-4, precision="highest")
rgb_p, t_p = jax.jit(
    lambda g: render_view(g, cam, cfg, impl="pallas"))(grid)
rgb_x, t_x = jax.jit(
    lambda g: render_view(g, cam, cfg, impl="xla"))(grid)
rgb_p, t_p, rgb_x, t_x = map(np.asarray, (rgb_p, t_p, rgb_x, t_x))
print("rgb max", rgb_p.max(), "nonzero:", (rgb_p > 0).any())
print("T range", t_p.min(), t_p.max())
print("pallas-vs-xla max abs diff:", np.abs(rgb_p - rgb_x).max())
assert rgb_p.max() > 0 and 0 <= t_p.min() and t_p.max() <= 1.0
assert np.abs(rgb_p - rgb_x).max() < 1e-5
write_png("/tmp/verify_r5.png", rgb_p)
print("wrote /tmp/verify_r5.png")


def loss(g):
    r, t = render_view(g, cam, cfg, impl="pallas")
    return jnp.mean((r - 0.3) ** 2)


gr = np.asarray(jax.jit(jax.grad(loss))(grid))
print("grad: finite", np.isfinite(gr).all(), "norm", np.linalg.norm(gr))
assert np.isfinite(gr).all() and np.linalg.norm(gr) > 0
print("TPU VERIFY OK")
