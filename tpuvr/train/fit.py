"""Inverse rendering: recover a voxel grid from posed views (C9).

``fit_grid`` runs Adam on the grid against L2 image loss over posed views
(BASELINE.json:10: 256^3 from 64 views). TPU-native structure:

- views are grouped by their static sweep signature (axis, reverse); all
  per-view geometry is *data* (tpuvr.ops.geometry.view_geometry), so there
  is exactly one compiled train-step program per group — not per camera;
- each step renders a static-size minibatch of views from one group
  (round-robin) through the differentiable sweep op and updates the grid;
- with a mesh, every view's rays are row-sharded across devices and grid
  gradients all-reduce over ICI via shard_map's transpose (C10);
- density is parameterized through softplus by default so the optimizer
  never fights the renderer's rectifier (dead-relu voxels).

Checkpoint/resume via orbax every ``ckpt_every`` steps; metrics stream to
JSONL (SURVEY.md §5).
"""

from __future__ import annotations

import functools
import logging
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpuvr.config import RenderConfig, TrainConfig
from tpuvr.ops.geometry import view_geometry
from tpuvr.ops.render import render_with_geom
from tpuvr.train.ckpt import Checkpointer
from tpuvr.utils.metrics import MetricsLogger, psnr

log = logging.getLogger("tpuvr")

_SOFTPLUS_INV_001 = float(np.log(np.expm1(0.01)))  # raw init -> sigma 0.01


def params_to_grid(params, density_softplus: bool):
    """Map raw optimization parameters to the rendered voxel grid."""
    if not density_softplus:
        return params
    sigma = jax.nn.softplus(params[..., :1])
    return jnp.concatenate([sigma, params[..., 1:]], axis=-1)


def init_params(grid_shape, density_softplus: bool, dtype=jnp.float32):
    params = jnp.zeros(grid_shape, dtype)
    if density_softplus:
        params = params.at[..., 0].set(_SOFTPLUS_INV_001)
    params = params.at[..., 1:].set(0.5)
    return params


def group_views(cams, grid_shape, dtype=jnp.float32):
    """Group cameras by static sweep signature; stack their geometry.

    Returns {(axis, reverse): (view_indices, stacked_geom, band)} with
    ``band`` the group-wide static (max |ay|, max |ax|) bound for the
    banded kernel.
    """
    groups: Dict[Tuple[int, bool], Tuple[List[int], List, List]] = {}
    for i, cam in enumerate(cams):
        axis, reverse, geom, band = view_geometry(cam, grid_shape, dtype)
        groups.setdefault((axis, reverse), ([], [], []))
        groups[(axis, reverse)][0].append(i)
        groups[(axis, reverse)][1].append(geom)
        groups[(axis, reverse)][2].append(band)
    out = {}
    for key, (idxs, geoms, bands) in groups.items():
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *geoms)
        band = (max(b[0] for b in bands), max(b[1] for b in bands),
                min(b[2] for b in bands), min(b[3] for b in bands))
        out[key] = (idxs, stacked, band)
    return out


def make_train_step(
    key,
    n_views: int,
    opt,
    render_cfg: RenderConfig,
    density_softplus: bool,
    impl: Optional[str],
    mesh,
    grad_buckets: int = 4,
    band: Optional[tuple] = None,
):
    """One jitted train step for a view group (axis, reverse static).

    Without a mesh: plain value_and_grad over the view minibatch.

    With a 'data' mesh (C10): the whole forward+backward runs inside
    shard_map with each device sweeping its row tile of every view's
    intermediate image; the (small) intermediate images are all_gather'd
    for the pixel warp + loss, and the grid gradient is all-reduced in
    ``grad_buckets`` bucketed psums so XLA can overlap early buckets with
    remaining backward work (BASELINE.json:5 "overlapped with the backward
    sweep").
    """
    from jax.sharding import PartitionSpec as P

    from tpuvr.dist.init import bucketed_psum_grads
    from tpuvr.ops.geometry import warp_to_pixels_dynamic
    from tpuvr.ops.render import grid_to_sweep_layout, slice_enables
    from tpuvr.ops.vjp import resolve_impl, sweep_op

    axis, reverse = key

    if mesh is None:

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, geom_batch, targets):
            def loss_fn(params):
                grid = params_to_grid(params, density_softplus)
                total = 0.0
                for i in range(n_views):
                    geom_i = jax.tree.map(lambda a: a[i], geom_batch)
                    rgb, _ = render_with_geom(
                        grid, geom_i, axis, reverse, render_cfg, impl=impl,
                        band=band,
                    )
                    total = total + jnp.mean((rgb - targets[i]) ** 2)
                return total / n_views

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    n_shards = mesh.shape["data"]
    op = sweep_op(
        reverse, render_cfg.sigma_scale, render_cfg.early_stop_eps,
        resolve_impl(impl), render_cfg.precision, band=band,
    )

    def local(params, geom_batch, targets):
        dtype = params.dtype
        rows_local = geom_batch["dt"].shape[1]
        row_off = (jax.lax.axis_index("data") * rows_local).astype(dtype)

        def loss_local(params):
            grid = params_to_grid(params, density_softplus)
            grid_sc = grid_to_sweep_layout(grid, axis)
            enables = slice_enables(
                grid_sc, reverse, render_cfg.use_occupancy
            )
            total = 0.0
            for i in range(n_views):
                geom_i = jax.tree.map(lambda a: a[i], geom_batch)
                c = geom_i["coeffs"]
                ay, by, ax, bx = c[0], c[1], c[2], c[3]
                rgb_t, t_t = op(
                    grid_sc, (ay, by + row_off * ay, ax, bx),
                    enables, geom_i["dt"],
                )
                inter_t = jnp.transpose(
                    jnp.concatenate([rgb_t, t_t[None]], 0), (1, 2, 0)
                )  # (rows_local, U, 4)
                inter = jax.lax.all_gather(
                    inter_t, "data", axis=0, tiled=True
                )  # (V, U, 4)
                img = warp_to_pixels_dynamic(
                    inter, geom_i["lattice"], geom_i["uv"]
                )[..., :3]
                total = total + jnp.mean((img - targets[i]) ** 2)
            return total / n_views

        loss, grads = jax.value_and_grad(loss_local)(params)
        grads = bucketed_psum_grads(grads, "data", grad_buckets)
        return loss, grads

    geom_specs = {
        "coeffs": P(), "dt": P(None, "data", None),
        "lattice": P(), "uv": P(),
    }

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, geom_batch, targets):
        loss, grads = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), geom_specs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, geom_batch, targets)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def fit_grid(
    targets,
    cams,
    grid_shape,
    cfg: TrainConfig = TrainConfig(),
    render_cfg: RenderConfig = RenderConfig(),
    mesh=None,
    impl: Optional[str] = None,
    run_dir: Optional[str] = None,
    resume: bool = False,
):
    """Optimize a voxel grid to reproduce ``targets`` from ``cams``.

    Args:
      targets: (N, H, W, 3) posed view images.
      cams: list of N cameras.
      grid_shape: (Z, Y, X, 4) of the grid to recover.
      cfg/render_cfg: training and renderer configs.
      mesh: optional 1-D 'data' Mesh for ray-sharded DP (C10).
      run_dir: metrics/checkpoint directory (defaults to cfg.ckpt_dir).

    Returns:
      (grid (rendered-space), params, history dict)
    """
    targets = jnp.asarray(targets)
    run_dir = run_dir or cfg.ckpt_dir
    metrics = MetricsLogger(run_dir)
    opt = optax.adam(cfg.lr)
    params = init_params(grid_shape, cfg.density_softplus)
    opt_state = opt.init(params)
    start_step = 0

    ckpt = Checkpointer(f"{run_dir}/ckpt") if cfg.ckpt_every else None
    if resume and ckpt is not None and ckpt.latest_step() is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            {"params": params, "opt_state": opt_state},
        )
        step_no, state = ckpt.restore(abstract)
        params, opt_state = state["params"], state["opt_state"]
        start_step = step_no + 1
        log.info("resumed from checkpoint at step %d", step_no)

    groups = group_views(cams, grid_shape)
    group_keys = sorted(groups.keys())
    steps_fns = {}
    for key in group_keys:
        idxs, _, band = groups[key]
        k_views = min(cfg.views_per_batch, len(idxs))
        steps_fns[key] = make_train_step(
            key, k_views, opt, render_cfg, cfg.density_softplus, impl,
            mesh, band=band,
        )

    rng = np.random.default_rng(cfg.seed + start_step)
    history = {"loss": []}
    for step_no in range(start_step, cfg.steps):
        key = group_keys[step_no % len(group_keys)]
        idxs, geom_stacked, _ = groups[key]
        k_views = min(cfg.views_per_batch, len(idxs))
        pick = rng.choice(len(idxs), size=k_views, replace=False)
        geom_batch = jax.tree.map(lambda a: a[jnp.asarray(pick)],
                                  geom_stacked)
        tgt = targets[jnp.asarray([idxs[p] for p in pick])]
        params, opt_state, loss = steps_fns[key](
            params, opt_state, geom_batch, tgt
        )
        loss_f = float(loss)
        history["loss"].append(loss_f)
        metrics.write(step_no, loss=loss_f, group=str(key))
        if ckpt is not None and cfg.ckpt_every and (
            (step_no + 1) % cfg.ckpt_every == 0 or step_no == cfg.steps - 1
        ):
            ckpt.save(step_no,
                      {"params": params, "opt_state": opt_state})
    if ckpt is not None:
        ckpt.wait()
        ckpt.close()
    grid = params_to_grid(params, cfg.density_softplus)
    return grid, params, history


def render_all_views(grid, cams, render_cfg=RenderConfig(), impl=None):
    """Render every camera; returns (N, H, W, 3)."""
    from tpuvr.ops.render import render_view

    return jnp.stack(
        [render_view(grid, cam, render_cfg, impl=impl)[0] for cam in cams]
    )


def evaluate_psnr(grid, cams, targets, render_cfg=RenderConfig(), impl=None):
    preds = render_all_views(grid, cams, render_cfg, impl)
    return float(psnr(preds, jnp.asarray(targets)))
