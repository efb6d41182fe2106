"""Config 3 (BASELINE.json:9): 256^3 grid with hemisphere-sampled
single-scatter lighting (N=16 samples/pixel), 512x512 frames."""

from tpuvr.config import LightingConfig, RenderConfig

CONFIG = {
    "name": "c3",
    "grid_n": 256,
    "res": 512,
    "camera": "orbit_persp",
    "render": RenderConfig(early_stop_eps=1e-4, use_occupancy=True),
    "lighting": LightingConfig(mode="lightvolume", n_samples=16),
}
