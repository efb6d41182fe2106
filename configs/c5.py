"""Config 5 (BASELINE.json:11): 512^3 grid path-traced (single-scatter)
at 1024x1024 across N>=2 hosts — sharded rays, overlapped grid-grad
allreduce, scaling-efficiency sweep."""

from tpuvr.config import LightingConfig, MeshConfig, RenderConfig

CONFIG = {
    "name": "c5",
    "grid_n": 512,
    "res": 1024,
    "camera": "orbit_persp",
    "render": RenderConfig(early_stop_eps=1e-4, use_occupancy=True),
    "lighting": LightingConfig(mode="lightvolume", n_samples=16),
    "mesh_cfg": MeshConfig(data=0, zshard=1, grad_buckets=4),  # data=0: all
    "multihost": True,
    "scaling_sweep": True,
}
