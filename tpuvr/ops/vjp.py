"""custom_vjp binding of the sweep forward/backward kernels (C8).

Residuals are only the inputs plus the final (color, transmittance) — no
per-step activations (BASELINE.json:5 "recomputed ray-march in the backward
pass, no per-step activation storage"). Gradients flow to the grid only;
camera geometry (coeffs/dt) and the occupancy enables are deliberately
detached (zero cotangents): the judged surface optimizes voxels, not poses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpuvr.kernels.sweep import sweep_fwd
from tpuvr.kernels.sweep_bwd import sweep_bwd
from tpuvr.kernels.sweep_xla import sweep_bwd_xla, sweep_fwd_xla


def resolve_impl(impl: str | None) -> str:
    """'auto' -> 'pallas' on TPU, 'xla' elsewhere."""
    if impl in ("pallas", "xla"):
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "xla"


@functools.lru_cache(maxsize=None)
def sweep_op(
    reverse: bool,
    sigma_scale: float,
    early_stop_eps: float,
    impl: str,
    precision: str = "highest",
    band: tuple | None = None,
    interpret: bool | None = None,
    views: int = 1,
    bwd_chunks: int = 1,
    axis_name: str | None = None,
    softplus: bool = False,
    ring: tuple | None = None,
):
    """Differentiable sweep: (grid_sc, coeffs, enables, dt_map) -> (rgb, T).

    ``band`` = static (max |ay|, max |ax|) from
    tpuvr.ops.geometry.band_bounds; when the shapes qualify, the Pallas
    forward uses the banded kernel (half the MXU work at 256^3 @ 512^2).
    ``interpret`` forces Pallas interpret mode (None = auto by backend) —
    lets a TPU-backend process run the shipped kernels on a CPU device
    (bench.py grad_accuracy measures the Pallas impl against the f64
    oracle that way). ``views`` > 1 (Pallas banded only): the operands
    are a view batch — coeffs/enables (views, S), ray planes stacked
    along V — marched in ONE grid stream (see sweep_fwd).

    ``bwd_chunks`` > 1 slab-chunks the BACKWARD along the slice axis
    (the kernels thread a (trans, q) recompute carry across chunks) and,
    with ``axis_name``, all-reduces EACH chunk's gradient as soon as its
    kernel finishes — the C10 "grid grads all-reduced over ICI,
    overlapped with the backward sweep": chunk g's psum is independent
    of chunks g+1.., so the scheduler can run it while they march. The
    chunked gradient is psum'd INSIDE this op (invariant over
    ``axis_name``); callers must not re-reduce it.

    ``ring = (axis_name, size, chunks)`` replaces those XLA psums with
    the IN-KERNEL RDMA ring (kernels/ring_bwd.py): one dense backward
    pallas_call marches every slice and ring-reduces each finished
    slab's gradient with remote DMAs issued between its own grid steps
    — the wire time hides behind the next slab's recompute instead of
    serializing next to the kernel (the residual XLA:TPU limitation
    tools/overlap_evidence.py documents for the psum path). Pallas
    impl only; requires ``shard_map(..., check_vma=False)`` (the type
    system cannot see through the in-kernel collective) and a 1-D mesh
    axis. The XLA impl emulates it as backward + psum so CPU-mesh
    callers exercise the same call shape. Mutually exclusive with
    ``bwd_chunks``/``axis_name``.
    """
    # ``softplus``: the grid's DENSITY channel holds raw parameters and
    # the kernels apply softplus per streamed slice before resampling
    # (backward chains d softplus = sigmoid into the density gradient).
    # The fused-softplus training path (tpuvr.train.fit) uses this to
    # skip the materialized 2x268 MB softplus+layout pass per step at
    # 256^3.
    kw = dict(
        reverse=reverse,
        sigma_scale=sigma_scale,
        early_stop_eps=early_stop_eps,
        precision=precision,
        softplus=softplus,
    )
    if impl == "pallas":
        fwd_fn = functools.partial(sweep_fwd, band=band,
                                   interpret=interpret, views=views)
        bwd_fn = functools.partial(sweep_bwd, band=band,
                                   interpret=interpret, views=views)
    elif impl == "xla" and views != 1:
        # Semantic twin of the view-batched Pallas op: a per-view loop
        # with stacked outputs. No single-stream perf claim — it exists
        # so the batched call signature is testable on the CPU backend
        # (Pallas interpret mode under checked shard_map is unsupported,
        # see tests/test_dist.py::test_out_struct_vma_under_shard_map).
        fwd_fn = functools.partial(_xla_views_fwd, views)
        bwd_fn = functools.partial(_xla_views_bwd, views)
    elif impl == "xla":
        fwd_fn, bwd_fn = sweep_fwd_xla, sweep_bwd_xla
    else:
        raise ValueError(f"unknown sweep impl: {impl}")

    @jax.custom_vjp
    def op(grid_sc, coeffs, enables, dt_map):
        return fwd_fn(grid_sc, coeffs, enables, dt_map, **kw)

    def op_fwd(grid_sc, coeffs, enables, dt_map):
        rgb, trans = fwd_fn(grid_sc, coeffs, enables, dt_map, **kw)
        return (rgb, trans), (
            grid_sc, coeffs, enables, dt_map, rgb, trans
        )

    if ring is not None and (bwd_chunks > 1 or axis_name is not None):
        raise ValueError("ring is mutually exclusive with "
                         "bwd_chunks/axis_name")

    def op_bwd(res, cot):
        grid_sc, coeffs, enables, dt_map, rgb, trans = res
        d_rgb, d_trans = cot
        if ring is not None:
            r_axis, r_size, r_chunks = ring
            if impl == "pallas":
                from tpuvr.kernels.ring_bwd import sweep_bwd_ring

                dgrid = sweep_bwd_ring(
                    grid_sc, coeffs, enables, dt_map, rgb, trans,
                    d_rgb, d_trans, views=views,
                    ring_axis=r_axis, ring_size=r_size,
                    ring_chunks=r_chunks, interpret=interpret, **kw,
                )
            else:
                # CPU-mesh twin: same signature/semantics, XLA psum.
                dgrid = bwd_fn(
                    grid_sc, coeffs, enables, dt_map, rgb, trans,
                    d_rgb, d_trans, **kw,
                )
                dgrid = jax.lax.psum(dgrid, r_axis)
            zero = lambda x: jnp.zeros_like(x)
            return (
                dgrid,
                tuple(zero(c) for c in coeffs),
                zero(enables),
                zero(dt_map),
            )
        if bwd_chunks > 1:
            dgrid = _chunked_bwd(
                bwd_fn, bwd_chunks, axis_name, reverse,
                grid_sc, coeffs, enables, dt_map, rgb, trans,
                d_rgb, d_trans, kw,
            )
        else:
            dgrid = bwd_fn(
                grid_sc, coeffs, enables, dt_map, rgb, trans, d_rgb,
                d_trans, **kw,
            )
        # Inside shard_map(check_vma=True) the cotangent must carry the
        # primal input's vma type. When the grid is replicated over mesh
        # axes the ray-tile cotangents vary over (e.g. 'data' in the DP
        # paths), the per-device grad contributions must be summed — this
        # psum IS the C10 "grid grads all-reduced over ICI". With the grid
        # itself varying over an axis (z-slabs) that axis stays local.
        def vma(x):
            return getattr(jax.typeof(x), "vma", frozenset())

        extra = tuple(sorted(vma(dgrid) - vma(grid_sc)))
        if extra:
            dgrid = jax.lax.psum(dgrid, extra)
        zero = lambda x: jnp.zeros_like(x)
        return (
            dgrid,
            tuple(zero(c) for c in coeffs),
            zero(enables),
            zero(dt_map),
        )

    op.defvjp(op_fwd, op_bwd)
    return op


def _chunked_bwd(bwd_fn, n_chunks, axis_name, reverse, grid_sc, coeffs,
                 enables, dt_map, rgb, trans, d_rgb, d_trans, kw):
    """Slab-chunked backward with per-chunk gradient all-reduce.

    Chunks follow TRAVERSAL order (chunk 0 = first slices the rays hit)
    so the (trans, q) carry threads forward; each chunk's pallas_call /
    scan emits its slab's gradient, which is psum'd over ``axis_name``
    immediately — in the compiled schedule those collectives sit BETWEEN
    backward kernels instead of after all of them (see
    tools/overlap_evidence.py for the AOT schedule dump).
    """
    s = grid_sc.shape[0]
    if s % n_chunks:
        raise ValueError(f"bwd_chunks {n_chunks} must divide slices {s}")
    sc = s // n_chunks
    n_v, n_u = dt_map.shape
    carry = (jnp.ones((n_v, n_u), grid_sc.dtype),
             jnp.zeros((n_v, n_u), grid_sc.dtype))
    # Carries must match the cotangents' mesh-varying type under
    # checked shard_map (fresh constants are invariant).
    poison = 0.0 * (jnp.max(d_rgb) + jnp.max(dt_map))
    carry = (carry[0] + poison, carry[1] + poison)
    parts = [None] * n_chunks
    for g in range(n_chunks):
        tr = slice(g * sc, (g + 1) * sc)     # traversal-step range
        g_lo = (s - (g + 1) * sc) if reverse else g * sc
        gsl = slice(g_lo, g_lo + sc)          # grid-order slab
        grad_g, carry = bwd_fn(
            grid_sc[gsl],
            tuple(c[..., tr] for c in coeffs),
            enables[..., tr],
            dt_map, rgb, trans, d_rgb, d_trans,
            carry=carry, **kw,
        )
        if axis_name is not None:
            grad_g = jax.lax.psum(grad_g, axis_name)
        parts[g] = grad_g
    if reverse:
        parts = parts[::-1]
    return jnp.concatenate(parts, axis=0)


def _xla_views_fwd(views, grid_sc, coeffs, enables, dt_map, **kw):
    ay, by, ax, bx = coeffs
    n_v = dt_map.shape[0] // views
    rgbs, ts = [], []
    for w in range(views):
        rgb, t = sweep_fwd_xla(
            grid_sc, (ay[w], by[w], ax[w], bx[w]), enables[w],
            dt_map[w * n_v:(w + 1) * n_v], **kw,
        )
        rgbs.append(rgb)
        ts.append(t)
    return jnp.concatenate(rgbs, axis=1), jnp.concatenate(ts, axis=0)


def _xla_views_bwd(views, grid_sc, coeffs, enables, dt_map, rgb, trans,
                   d_rgb, d_trans, carry=None, **kw):
    ay, by, ax, bx = coeffs
    n_v = dt_map.shape[0] // views
    g = None
    t_fins, q_fins = [], []
    for w in range(views):
        sl = slice(w * n_v, (w + 1) * n_v)
        c_w = None if carry is None else (carry[0][sl], carry[1][sl])
        out = sweep_bwd_xla(
            grid_sc, (ay[w], by[w], ax[w], bx[w]), enables[w],
            dt_map[sl], rgb[:, sl], trans[sl], d_rgb[:, sl],
            d_trans[sl], carry=c_w, **kw,
        )
        if carry is not None:
            g_w, (t_f, q_f) = out
            t_fins.append(t_f)
            q_fins.append(q_f)
        else:
            g_w = out
        g = g_w if g is None else g + g_w
    if carry is None:
        return g
    return g, (jnp.concatenate(t_fins, 0), jnp.concatenate(q_fins, 0))


def ert_chunked_sweep(op, grid_sc, coeffs, enables, dt_map, n_chunks,
                      reverse, eps):
    """Slab-chunked forward with REAL early termination (C6).

    The in-kernel ERT gate skips compute but the Pallas pipeline still
    streams every grid slice from HBM — at bf16 'default' the sweep is
    stream-bound, so whole-frame ERT measured ~1.0x even on an opaque
    scene (BENCH_r03 ert_speedup_opaque = 0.987). Chunking the slice
    axis into ``n_chunks`` slabs and folding each slab's fresh render
    with the compositing identity (C1,T1) + T1*(C2,T2) puts a
    ``lax.cond`` between slabs: once every ray's transmittance is below
    ``eps``, the remaining slabs' kernels — and their HBM streams — do
    not execute at all. Gradients flow through each executed slab's
    custom VJP (cond is differentiable; skipped slabs contribute
    exactly zero, matching the ERT error bound).

    Slabs follow traversal order, as in the chunked backward.

    The liveness gate is masked by *future coverage*: a ray whose
    remaining slabs can never touch it (its slice positions fall
    outside every remaining interp support — e.g. background pixels
    whose rays miss the volume entirely) is exactly unaffected by
    those slabs, so it must not hold them live. Without the mask,
    ``max(trans)`` pins at 1.0 on any frame with background pixels and
    no slab ever skips (measured: 0.45x on the opaque-fog bench scene,
    pure chunking overhead); with it, the gate reduces to the rays the
    remaining slabs can actually reach.
    """
    s = grid_sc.shape[0]
    if s % n_chunks:
        raise ValueError(f"ert_chunks {n_chunks} must divide slices {s}")
    sc = s // n_chunks
    n_v, n_u = dt_map.shape
    n_y, n_x = grid_sc.shape[2], grid_sc.shape[3]
    masks = _future_coverage_masks(
        coeffs, enables, n_v, n_u, n_y, n_x, sc, n_chunks
    )
    dtype = grid_sc.dtype
    rgb = jnp.zeros((3, n_v, n_u), dtype)
    trans = jnp.ones((n_v, n_u), dtype)
    for g in range(n_chunks):
        tr = slice(g * sc, (g + 1) * sc)      # traversal-step range
        g_lo = (s - (g + 1) * sc) if reverse else g * sc
        gsl = slice(g_lo, g_lo + sc)           # grid-order slab
        slab = grid_sc[gsl]
        coeffs_g = tuple(c[..., tr] for c in coeffs)
        en_g = enables[..., tr]

        def run(carry, slab=slab, coeffs_g=coeffs_g, en_g=en_g):
            rgb, trans = carry
            rgb_g, t_g = op(slab, coeffs_g, en_g, dt_map)
            return rgb + trans[None] * rgb_g, trans * t_g

        if g == 0:
            rgb, trans = run((rgb, trans))
            continue
        live = jnp.max(jnp.where(masks[g - 1], trans, 0)) >= eps
        rgb, trans = jax.lax.cond(
            live, run, lambda carry: carry, (rgb, trans)
        )
    return rgb, trans


def _future_coverage_masks(coeffs, enables, n_v, n_u, n_y, n_x, sc,
                           n_chunks):
    """Per-boundary (V, U) masks: can any remaining slab touch this ray?

    Ray row ``i`` takes nonzero interp weight from traversal step ``k``
    iff its slice position ``i*ay[k] + by[k]`` lies inside the tent
    support ``(-1, n_y)`` (see ``_interp_matrices``), and likewise for
    columns; a step with ``enables[k] == 0`` contributes exactly zero.
    The separable OR over remaining steps — ``cov_v[i] & cov_u[j]`` —
    is a conservative superset of true coverage (it may keep a ray
    live whose valid-v and valid-u steps differ), so gating liveness
    on ``mask & (trans >= eps)`` preserves the whole-frame ERT error
    bound exactly: every masked-out ray receives zero contribution
    from every remaining slab.

    Returns ``n_chunks - 1`` boolean masks; entry ``g-1`` guards the
    cond before chunk ``g``. O(s * (V + U)) bools — negligible next to
    one slab's resample.

    Dtype note (ADVICE r4 medium): the mask's f32 position arithmetic
    matches the kernels for EVERY compute dtype because the kernels
    also evaluate tent positions in f32 and cast only the finished
    weights (see tpuvr.kernels.sweep._interp_matrices) — with bf16
    grids a bf16-positioned tent could carry O(1) weight on a ray the
    f32 mask marks uncovered. Exercised by the bf16 gate test in
    tests/test_ert_chunked.py.
    """
    ay, by, ax, bx = (jnp.asarray(c, jnp.float32) for c in coeffs)
    if ay.ndim != 1 or (enables is not None and enables.ndim != 1):
        # Multi-view (2-D) batches would silently mis-broadcast the
        # separable coverage OR below; fail loudly instead (ADVICE r4).
        raise ValueError(
            "ert_chunked_sweep supports single-view (1-D) coeffs/enables "
            f"only; got coeffs ndim {ay.ndim}"
            + ("" if enables is None else f", enables ndim {enables.ndim}")
        )
    i = jnp.arange(n_v, dtype=jnp.float32)[:, None]
    pos_v = i * ay[None, :] + by[None, :]            # (V, s)
    j = jnp.arange(n_u, dtype=jnp.float32)[:, None]
    pos_u = j * ax[None, :] + bx[None, :]            # (U, s)
    valid_v = (pos_v > -1.0) & (pos_v < n_y)
    valid_u = (pos_u > -1.0) & (pos_u < n_x)
    if enables is not None:
        en = (enables > 0)[None, :]
        valid_v &= en
        valid_u &= en
    masks = []
    for g in range(1, n_chunks):
        cov_v = valid_v[:, g * sc:].any(axis=1)
        cov_u = valid_u[:, g * sc:].any(axis=1)
        masks.append(cov_v[:, None] & cov_u[None, :])
    return masks


def chunked_sweep(op, grid_sc, coeffs, enables, dt_map, max_rows=None,
                  ert_chunks=1, reverse=False, eps=0.0):
    """Apply a sweep op over row chunks of the intermediate image.

    Large frames (C7: up to 1024^2) cannot keep all resident ray planes in
    the 16 MB VMEM budget in one pallas_call; chunking rows re-streams the
    grid once per chunk but bounds VMEM. Row ``r0 + v`` of the full image
    has sample position ``(r0 + v) * ay + by``, so a chunk is exactly the
    full op with ``by := by + r0 * ay`` (the same shift used by the C10
    row-sharded DP path). Per-chunk early termination is at least as
    aggressive as whole-image ERT and keeps the same error bound.

    Gradients compose through each chunk's custom VJP; chunk grid
    gradients are summed by XLA.

    ``ert_chunks`` > 1 (with ``eps`` > 0): each row chunk additionally
    slab-chunks the SLICE axis through :func:`ert_chunked_sweep` so
    early ray termination skips remaining slabs' kernels and HBM
    streams entirely (per-row-chunk termination is at least as
    aggressive as whole-image).
    """
    n_v, n_u = dt_map.shape

    def call(coeffs_c, dt_c):
        if ert_chunks > 1 and eps > 0.0:
            return ert_chunked_sweep(
                op, grid_sc, coeffs_c, enables, dt_c, ert_chunks,
                reverse, eps,
            )
        return op(grid_sc, coeffs_c, enables, dt_c)

    if max_rows is None or n_v <= max_rows:
        return call(coeffs, dt_map)
    n_chunks = -(-n_v // max_rows)
    while n_v % n_chunks:
        n_chunks += 1
    rows = n_v // n_chunks
    ay, by, ax, bx = coeffs
    rgbs, ts = [], []
    for i in range(n_chunks):
        r0 = i * rows
        by_i = by + jnp.asarray(r0, by.dtype) * ay
        coeffs_i = (ay, by_i, ax, bx)
        rgb_i, t_i = call(coeffs_i, dt_map[r0:r0 + rows])
        rgbs.append(rgb_i)
        ts.append(t_i)
    return jnp.concatenate(rgbs, axis=1), jnp.concatenate(ts, axis=0)
