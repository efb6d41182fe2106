"""Config 4 (BASELINE.json:10): inverse rendering — recover a 256^3
density grid from 64 posed views, Adam on the voxel grid, ray tiles
sharded across one host's devices (replicated grid, psum'd grads)."""

from tpuvr.config import RenderConfig, TrainConfig

CONFIG = {
    "name": "c4",
    "grid_n": 256,
    "res": 256,
    "n_views": 64,
    "render": RenderConfig(early_stop_eps=0.0, use_occupancy=True),
    "train": TrainConfig(lr=5e-2, steps=2000, views_per_batch=8,
                         ckpt_every=200),
    "mesh": "data",  # shard rays over all local devices
}
