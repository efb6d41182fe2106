"""Config 2 (BASELINE.json:8): 128^3 grid, perspective camera, early ray
termination + empty-space skipping, fwd+bwd gradcheck vs finite diffs."""

from tpuvr.config import RenderConfig

CONFIG = {
    "name": "c2",
    "grid_n": 128,
    "res": 256,
    "camera": "orbit_persp",
    "render": RenderConfig(early_stop_eps=1e-4, use_occupancy=True),
    "lighting": None,
    "gradcheck": {"grid_n": 16, "res": 24, "fd_eps": 1e-5},
}
