"""Config 1 (BASELINE.json:7): 64^3 synthetic smoke-sphere, 256x256
orthographic ray-march, emission-absorption only, CPU jnp reference."""

from tpuvr.config import RenderConfig

CONFIG = {
    "name": "c1",
    "grid_n": 64,
    "res": 256,
    "camera": "front_ortho",
    "render": RenderConfig(early_stop_eps=0.0, use_occupancy=False),
    "lighting": None,
    "oracle": "render_plane_sweep",
}
