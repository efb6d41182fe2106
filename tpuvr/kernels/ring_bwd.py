"""Backward sweep with an IN-KERNEL RDMA ring grad all-reduce (C10).

The last north-star clause (BASELINE.json:5 "grid grads all-reduced over
ICI, overlapped with the backward sweep") asks for the grad reduction to
be HIDDEN behind backward compute, not merely interleaved. Rounds 3-4
built the structural prerequisite — a slab-chunked backward whose
per-chunk ``lax.psum``s the AOT v5e:2x4 schedule places BETWEEN the
backward kernels — but XLA:TPU emits those collectives synchronously
next to opaque Pallas custom-calls (tools/overlap_evidence.py), so the
wire time still serializes. This kernel closes the clause the TPU-native
way: the whole chunked backward becomes ONE pallas_call whose grid
marches every slice, and the ring all-reduce of each finished slab's
gradient is carried out by ``pltpu.make_async_remote_copy`` DMAs issued
BETWEEN backward grid steps — the ICI transfers fly while the next
slab's recompute matmuls occupy the MXU. Only the LAST slab's reduction
has no compute to hide behind (1/n_chunks of the comm — exactly the
tail the comm model charges, tools/comm_model.py).

Ring design (per slab of ``sc`` slices, over ``D = ring_size`` devices
on the 1-D ``ring_axis`` mesh axis; R = 2*(D-1) rounds; slab split into
D equal segments of ``sc // D`` grid slices). Accumulating DMAs
(``start(add=True)``) are NOT available — Mosaic raises
NotImplementedError and the interpreter silently ignores the flag
(both verified on this container) — so reductions stage through a
two-slot HBM receive buffer:

- round r: every device sends segment ``(my - r) % D`` of its grad
  buffer (partially reduced for r < D-1, fully reduced for the
  all-gather rounds r >= D-1) to its RIGHT neighbor's receive slot
  ``r % 2``; the receiver consumes it one ring-issue later — a staged
  VPU add into its own copy of that segment for reduce-scatter rounds
  (HBM seg -> VMEM, HBM slot -> VMEM, add, VMEM -> HBM seg), a plain
  local HBM->HBM copy for all-gather rounds.
- pipeline offset: issue i performs [consume round i-1, send round i]
  so each round's wire transfer has a full grid step of backward
  compute to fly behind before anyone blocks on it; only the LAST
  slab's issues (and the final consume) drain without compute cover.
- flow control: a receive slot is reusable only after its previous
  occupant was consumed — the consumer signals one CREDIT to its left
  neighbor (a REGULAR remote semaphore); every send waits one credit
  except the first two ever (the slots start free), and the two
  leftover credits are drained at kernel exit so every semaphore ends
  at zero. Send semaphores retire on slot reuse (round r-2) plus a
  final wait per slot.
- pacing: ``pace = ceil((R+1)/spc)`` issues execute at the top of each
  grid step inside the NEXT slab's compute window — the MINIMAL rate,
  so each transfer gets the longest possible compute cover (an early
  even-forced pace bunched two issues per step and exposed half the
  wire time). Odd paces make issue parity depend on the step; the ring
  section is then emitted twice, once per step parity, so every
  semaphore slot stays compile-time static.

The gradient output lives in HBM (``memory_space=pltpu.HBM``) and the
kernel writes each block explicitly (VMEM scratch staged through a
local async copy) so the ring DMAs can read/target finished slabs —
the automatic output pipeline would keep blocks private until kernel
exit. The compute body is the dense view-batched backward of
tpuvr.kernels.sweep_bwd._sweep_bwd_dbatch_kernel (same recompute, same
suffix-trick formulas, same per-view ERT and stacked-E projection);
it is restated here rather than entangling the shipped single-chip
kernel with collective control flow.

Correctness is pinned two ways with no multi-chip hardware: the 8-dev
CPU mesh runs the REAL kernel under Pallas TPU-interpret mode (which
simulates remote DMAs, accumulating copies and semaphores —
tests/test_ring_bwd.py, equality vs psum of the XLA twin) and the AOT
deviceless v5e:2x4 compile proves Mosaic lowers it for real hardware
(tools/overlap_evidence.py, which also shows the schedule now contains
ZERO XLA all-reduce ops — the collective lives inside the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvr.kernels._compat import out_struct
from tpuvr.kernels.sweep import (
    _att_exp,
    _sigmoid,
    _softplus,
    batch_positions,
    sweep_dot,
)


def _seg_slice(grad_ref, my, a, r, *, D, sc, seg_sl, s, reverse):
    """Grad-buffer slice of ring segment ``(my - r) % D`` of slab a."""
    i32 = jnp.int32
    slab_lo = ((i32(s) - (a + i32(1)) * i32(sc)) if reverse
               else a * i32(sc))
    seg = jax.lax.rem(my - r + i32(2 * D), i32(D))
    return grad_ref.at[pl.ds(slab_lo + seg * i32(seg_sl), seg_sl)]


def _ring_issue(grad_ref, rbuf_ref, vseg_ref, vseg2_ref, send_sem,
                recv_sem, credit_sem, lsem, *, my, a, i, slot_send,
                slot_recv, D, sc, seg_sl, s, reverse, skip_send_wait):
    """Ring issue i of slab a: consume round i-1, then send round i.

    ``a``/``i`` may be traced (windowed issues) or static (drain);
    ``slot_send``/``slot_recv`` are always static (pace is even).
    ``skip_send_wait`` marks the first use of each send slot AND the
    first two credit-free sends (chunk 0, rounds 0/1).
    """
    i32 = jnp.int32
    my = jnp.asarray(my, i32)
    a = jnp.asarray(a, i32)
    i = jnp.asarray(i, i32)
    right = jax.lax.rem(my + i32(1), i32(D))
    left = jax.lax.rem(my - i32(1) + i32(D), i32(D))
    R = 2 * (D - 1)
    kw = dict(D=D, sc=sc, seg_sl=seg_sl, s=s, reverse=reverse)

    # ---- consume round i-1 (its transfer had a compute window to
    # arrive; the wait should find it already landed) ----
    @pl.when(i >= 1)
    def _consume():
        r = i - i32(1)
        dst = _seg_slice(grad_ref, my - i32(1), a, r, **kw)  # (my-1-r)
        rb = rbuf_ref.at[slot_recv]
        # Retire this round's incoming transfer (descriptor reconstructs
        # the matching semaphore + byte count).
        pltpu.make_async_remote_copy(
            src_ref=dst, dst_ref=rb,
            send_sem=send_sem.at[slot_recv],
            recv_sem=recv_sem.at[slot_recv],
            device_id=my, device_id_type=pltpu.DeviceIdType.LOGICAL,
        ).wait_recv()

        @pl.when(r < i32(D - 1))
        def _rs_add():
            # Staged reduce: HBM seg -> VMEM, HBM slot -> VMEM, add,
            # VMEM -> HBM seg.
            c1 = pltpu.make_async_copy(dst, vseg_ref, lsem)
            c1.start()
            c1.wait()
            c2 = pltpu.make_async_copy(rb, vseg2_ref, lsem)
            c2.start()
            c2.wait()
            vseg_ref[...] = vseg_ref[...] + vseg2_ref[...]
            c3 = pltpu.make_async_copy(vseg_ref, dst, lsem)
            c3.start()
            c3.wait()

        @pl.when(r >= i32(D - 1))
        def _ag_copy():
            c = pltpu.make_async_copy(rb, dst, lsem)
            c.start()
            c.wait()

        # Slot free again: grant a credit to the device that sends
        # into our receive buffers.
        pltpu.semaphore_signal(
            credit_sem, 1, device_id=left,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    # ---- send round i into right's receive slot ----
    @pl.when(i < i32(R))
    def _send():
        src = _seg_slice(grad_ref, my, a, i, **kw)       # (my - i)
        copy = pltpu.make_async_remote_copy(
            src_ref=src, dst_ref=rbuf_ref.at[slot_send],
            send_sem=send_sem.at[slot_send],
            recv_sem=recv_sem.at[slot_send],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

        @pl.when(jnp.logical_not(skip_send_wait))
        def _flow_control():
            copy.wait_send()                 # retire round i-2's send
            pltpu.semaphore_wait(credit_sem, 1)   # right's slot free

        copy.start()


def _sweep_bwd_ring_kernel(
    pos_ref,     # (B, 1, V) per-(slice, row) positions (enables folded)
    ax_ref,      # SMEM (views, S)
    bx_ref,      # SMEM (views, S)
    slice_ref,   # (B, 4, Y, X) grid slices (recompute)
    dt_ref,      # (V, U)
    dbias_ref,   # (V, U)
    d_c_ref,     # (3, V, U)
    trans0_ref,  # (V, U) carry in (identity for the full sweep)
    q0_ref,      # (V, U)
    grad_ref,    # out: (S, 4, Y, X) in HBM — ring-reduced in place
    trans_ref,   # out (V, U)
    q_ref,       # out (V, U)
    rbuf_ref,    # out HBM (2, seg_sl, 4, Y, X): ring receive slots —
                 # an output only because Mosaic supports no HBM
                 # scratch; the caller discards it
    tmp_ref,     # scratch (4, V, X) y-side recompute partials
    e_ref,       # scratch (4, V, X) B-projected cotangent planes
    gblk_ref,    # scratch (B, 4, Y, X): grad block staging
    vseg_ref,    # scratch (seg_sl, 4, Y, X): staged-add accumulator
    vseg2_ref,   # scratch (seg_sl, 4, Y, X): staged-add incoming
    tmax_ref,    # SMEM (views,) per-view ERT state
    wsem,        # DMA sem: gblk -> grad_ref block write
    lsem,        # DMA sem: local staging copies (waited immediately)
    send_sem,    # DMA sems (2,): ring sends, parity slots
    recv_sem,    # DMA sems (2,): ring receives, parity slots
    credit_sem,  # REGULAR sem: receive-slot credits from the right
    *,
    sigma_scale: float,
    early_stop_eps: float,
    precision: str,
    block: int,
    reverse: bool,
    views: int,
    softplus: bool,
    ring: tuple,     # (axis_name, D, n_chunks) — D > 1
):
    axis_name, D, n_chunks = ring
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    n_v, n_u = trans_ref.shape
    n_y, n_x = slice_ref.shape[2], slice_ref.shape[3]
    dtype = trans_ref.dtype
    v_pv = n_v // views
    s = n_steps * block
    sc = s // n_chunks                  # slices per slab
    seg_sl = sc // D                    # slices per ring segment
    spc = n_steps // n_chunks           # grid steps per slab
    R = 2 * (D - 1)
    # R+1 issues per slab (issue i = consume i-1 + send i), spread at
    # the MINIMAL rate so each round's wire transfer gets the longest
    # possible compute window before anyone blocks on it (an even
    # forced pace bunched 2 issues per step and exposed ~half the wire
    # time). Odd paces make the issue parity step-dependent; the
    # two-phase emission below keeps every semaphore slot static.
    pace = -(-(R + 1) // spc)
    my = jax.lax.axis_index(axis_name)
    ring_kw = dict(D=D, sc=sc, seg_sl=seg_sl, s=s, reverse=reverse)

    @pl.when(step == 0)
    def _init():
        trans_ref[...] = trans0_ref[...]
        q_ref[...] = q0_ref[...]
        for w in range(views):
            tmax_ref[w] = jnp.max(trans0_ref[w * v_pv:(w + 1) * v_pv])

    # ---- retire the previous step's grad-block write ----
    g_row = ((n_steps - 1 - step) if reverse else step) * block

    @pl.when(step > 0)
    def _wait_prev_write():
        prev = step - 1
        pg = ((n_steps - 1 - prev) if reverse else prev) * block
        pltpu.make_async_copy(
            gblk_ref, grad_ref.at[pl.ds(pg, block)], wsem
        ).wait()

    # ---- ring work for the previous slab (hidden behind this step's
    # compute window) ----
    i32 = jnp.int32
    a = step // i32(spc) - i32(1)
    local = jax.lax.rem(step, i32(spc))

    def _issues(phase):
        # Issue i = local*pace + rr has parity (phase*pace + rr) % 2
        # on steps with local % 2 == phase — static per emission site.
        # phase=None (even pace): parity is phase-independent (rr % 2)
        # and no step filter is needed.
        for rr in range(pace):
            i = local * i32(pace) + i32(rr)
            slot = (rr if phase is None else phase * pace + rr) % 2
            ok = jnp.logical_and(a >= 0, i <= R)
            if phase is not None:
                ok = jnp.logical_and(
                    ok, jax.lax.rem(local, i32(2)) == phase
                )
            skip = jnp.logical_and(a == 0, i < 2)
            pl.when(ok)(functools.partial(
                _ring_issue, grad_ref, rbuf_ref, vseg_ref, vseg2_ref,
                send_sem, recv_sem, credit_sem, lsem,
                my=my, a=a, i=i, slot_send=slot,
                slot_recv=(slot + 1) % 2,
                skip_send_wait=skip, **ring_kw,
            ))

    if pace % 2 == 0:
        _issues(None)
    else:
        _issues(0)
        _issues(1)

    # ---- backward compute for this step's slice block (the dense
    # view-batched body of sweep_bwd._sweep_bwd_dbatch_kernel, writing
    # into the gblk staging scratch) ----
    if early_stop_eps > 0.0:
        tall = tmax_ref[0]
        for w in range(1, views):
            tall = jnp.maximum(tall, tmax_ref[w])
        live = tall >= early_stop_eps
    else:
        live = True

    @pl.when(live)
    def _block():
        f32 = jnp.float32
        yy = jax.lax.broadcasted_iota(
            jnp.int32, (n_v, n_y), 1).astype(f32)
        ju = jax.lax.broadcasted_iota(
            jnp.int32, (n_x, n_u), 1).astype(f32)
        xx = jax.lax.broadcasted_iota(
            jnp.int32, (n_x, n_u), 0).astype(f32)

        def slice_body(b):
            k = step * block + b
            i_sl = block - 1 - b if reverse else b
            pos = pos_ref[b, 0].astype(f32)
            mat_a = jnp.maximum(
                0.0, 1.0 - jnp.abs(pos[:, None] - yy)
            ).astype(dtype)
            sl = slice_ref[i_sl]
            for c in range(4):
                src = sl[c]
                if softplus and c == 0:
                    src = _softplus(src)
                tmp_ref[c] = sweep_dot(mat_a, src, precision, dtype)

            def view_body(w):
                mat_b = jnp.maximum(
                    0.0,
                    1.0 - jnp.abs(ju * ax_ref[w, k].astype(f32)
                                  + bx_ref[w, k].astype(f32) - xx),
                ).astype(dtype)
                vs = slice(w * v_pv, (w + 1) * v_pv)

                def resample(c):
                    return sweep_dot(tmp_ref[c, vs, :], mat_b,
                                     precision, dtype)

                sig_raw = resample(0)
                sigma = jnp.maximum(sig_raw, 0.0)
                dt = dt_ref[vs]
                att = _att_exp((sigma_scale * sigma) * dt, precision)
                trans = trans_ref[vs]
                wgt = trans * (1.0 - att)
                q = q_ref[vs]
                dsig = -dbias_ref[vs]
                d_planes = []
                for c in range(3):
                    smp_c = resample(c + 1)
                    d_c = d_c_ref[c, vs, :]
                    q = q + (d_c * wgt) * smp_c
                    dsig = dsig + d_c * (trans * att) * smp_c
                    d_planes.append(d_c * wgt)
                q_ref[vs] = q
                dsig = (dsig + q) * (sigma_scale * dt)
                dsig = jnp.where(sig_raw > 0.0, dsig, 0.0)
                trans_ref[vs] = trans * att
                for g, d_vu in enumerate([dsig] + d_planes):
                    e_ref[g, vs] = sweep_dot(
                        d_vu, mat_b, precision, dtype,
                        dims=(((1,), (1,)), ((), ())),
                    )

            def view_dead(w):
                vs = slice(w * v_pv, (w + 1) * v_pv)
                e_ref[:, vs] = jnp.zeros_like(e_ref[:, vs])

            for w in range(views):
                if early_stop_eps > 0.0:
                    alive_w = tmax_ref[w] >= early_stop_eps
                    pl.when(alive_w)(functools.partial(view_body, w))
                    pl.when(jnp.logical_not(alive_w))(
                        functools.partial(view_dead, w)
                    )
                else:
                    view_body(w)

            for g in range(4):
                gs = sweep_dot(
                    mat_a, e_ref[g], precision, dtype,
                    dims=(((0,), (0,)), ((), ())),
                )
                if softplus and g == 0:
                    gs = gs * _sigmoid(sl[0])
                gblk_ref[i_sl, g] = gs

        for b in range(block):
            slice_body(b)
        if early_stop_eps > 0.0:
            for w in range(views):
                tmax_ref[w] = jnp.max(
                    trans_ref[w * v_pv:(w + 1) * v_pv]
                )

    @pl.when(jnp.logical_not(live))
    def _skipped():
        # Terminated frames still owe a (zero) block: the HBM grad
        # buffer is uninitialized and the ring reduces every segment.
        gblk_ref[...] = jnp.zeros_like(gblk_ref)

    # ---- stage this step's grad block out to HBM ----
    pltpu.make_async_copy(
        gblk_ref, grad_ref.at[pl.ds(g_row, block)], wsem
    ).start()

    # ---- final step: retire the write, drain the last slab's ring,
    # retire the last sends and the two leftover credits ----
    @pl.when(step == n_steps - 1)
    def _drain():
        pltpu.make_async_copy(
            gblk_ref, grad_ref.at[pl.ds(g_row, block)], wsem
        ).wait()
        a_last = n_chunks - 1
        for i in range(R + 1):
            _ring_issue(
                grad_ref, rbuf_ref, vseg_ref, vseg2_ref,
                send_sem, recv_sem, credit_sem, lsem,
                my=my, a=a_last, i=i, slot_send=i % 2,
                slot_recv=(i + 1) % 2,
                skip_send_wait=jnp.asarray(
                    n_chunks == 1 and i < 2, jnp.bool_),
                **ring_kw,
            )
        for slot in range(min(2, R)):
            # Retire the final send on each slot (the descriptor only
            # contributes the semaphore + byte count to the wait).
            seg0 = grad_ref.at[pl.ds(0, seg_sl)]
            pltpu.make_async_remote_copy(
                src_ref=seg0, dst_ref=rbuf_ref.at[slot],
                send_sem=send_sem.at[slot], recv_sem=recv_sem.at[slot],
                device_id=my, device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).wait_send()
        # The first two sends ever ran credit-free; drain the matching
        # two surplus credit signals so every semaphore exits at zero.
        pltpu.semaphore_wait(credit_sem, 2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "reverse", "sigma_scale", "early_stop_eps", "precision",
        "block", "views", "softplus", "ring_axis", "ring_size",
        "ring_chunks", "interpret",
    ),
)
def sweep_bwd_ring(
    grid_sc, coeffs, enables, dt_map, c_final, t_final, d_color,
    d_trans,
    *,
    reverse: bool = False,
    sigma_scale: float = 1.0,
    early_stop_eps: float = 0.0,
    precision: str = "highest",
    block: int | None = None,
    views: int = 1,
    softplus: bool = False,
    ring_axis: str = "data",
    ring_size: int = 1,
    ring_chunks: int = 4,
    interpret=None,
):
    """Dense backward sweep whose grid gradient comes out ALL-REDUCED
    over ``ring_axis`` (in-kernel RDMA ring; see module docstring).

    Must run inside ``shard_map`` over a 1-D mesh axis of size
    ``ring_size`` with ``check_vma=False`` (the type system cannot see
    through the in-kernel collective; the returned gradient is
    device-invariant by construction). ``ring_chunks`` slabs the slice
    axis; ``ring_chunks * ring_size`` must divide the slice count and
    ``ring_chunks`` must divide the grid-step count. ``interpret``
    accepts a ``pltpu.InterpretParams`` for the CPU-mesh lane (plain
    ``interpret=True`` cannot simulate remote DMAs).

    Single-view calls go through the same position-vector batched body
    (views=1); coeffs may be (S,) or (views, S) exactly as sweep_fwd.
    """
    from tpuvr.kernels._compat import use_interpret

    if interpret is None:
        interpret = use_interpret()
    if interpret is True:
        # Plain interpret mode cannot simulate remote DMAs; promote to
        # the TPU interpreter (which can).
        interpret = pltpu.InterpretParams()
    s, _, n_y, n_x = grid_sc.shape
    n_v, n_u = dt_map.shape
    dtype = grid_sc.dtype
    if ring_size < 2:
        raise ValueError("sweep_bwd_ring needs ring_size >= 2; use "
                         "sweep_bwd + psum on a single device")
    if block is None:
        # Same preference as the dbatch backward: 2-slice blocks
        # measured faster at the c4 shape (tools/kernel_tune.py).
        block = next(b for b in (2, 1) if s % b == 0)
    n_steps = s // block
    sc, rem = divmod(s, ring_chunks)
    if rem or sc % ring_size or n_steps % ring_chunks:
        raise ValueError(
            f"ring_chunks {ring_chunks} must divide slices {s} into "
            f"slabs divisible by ring_size {ring_size} and grid steps "
            f"{n_steps}"
        )
    seg_sl = sc // ring_size
    ay, by, ax, bx = coeffs
    if ay.ndim == 1:
        ay, by, ax, bx = (c[None] for c in (ay, by, ax, bx))
        enables = enables[None] if enables.ndim == 1 else enables
    pos, axv, bxv = batch_positions(
        (ay, by, ax, bx), enables, n_v, views, n_y, dtype
    )
    dbias = jnp.einsum("cvu,cvu->vu", d_color, c_final) + d_trans * t_final
    trans0 = jnp.ones((n_v, n_u), dtype)
    q0 = jnp.zeros((n_v, n_u), dtype)
    # Inherit the inputs' device-varying poison (shard_map carry rule,
    # harmless under check_vma=False).
    poison = 0.0 * (jnp.max(dt_map) + jnp.max(d_color))
    trans0, q0 = trans0 + poison, q0 + poison

    def block_index(step):
        return ((n_steps - 1 - step) if reverse else step, 0, 0, 0)

    kernel = functools.partial(
        _sweep_bwd_ring_kernel,
        sigma_scale=float(sigma_scale),
        early_stop_eps=float(early_stop_eps),
        precision=precision,
        block=block,
        reverse=reverse,
        views=views,
        softplus=softplus,
        ring=(ring_axis, int(ring_size), int(ring_chunks)),
    )
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    vu_spec = pl.BlockSpec((n_v, n_u), lambda k: (0, 0),
                           memory_space=pltpu.VMEM)
    cvu_spec = pl.BlockSpec((3, n_v, n_u), lambda k: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    grad, trans_fin, q_fin, rbuf = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((block, 1, n_v), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            scalar_spec, scalar_spec,
            pl.BlockSpec((block, 4, n_y, n_x), block_index,
                         memory_space=pltpu.VMEM),
            vu_spec, vu_spec, cvu_spec, vu_spec, vu_spec,
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            vu_spec, vu_spec,
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_shape=[
            out_struct((s, 4, n_y, n_x), dtype, grid_sc, enables, by,
                       dt_map, d_color),
            out_struct((n_v, n_u), dtype, grid_sc, enables, by, dt_map,
                       d_color),
            out_struct((n_v, n_u), dtype, grid_sc, enables, by, dt_map,
                       d_color),
            out_struct((2, seg_sl, 4, n_y, n_x), dtype, grid_sc,
                       enables, by, dt_map, d_color),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, n_v, n_x), dtype),
            pltpu.VMEM((4, n_v, n_x), dtype),
            pltpu.VMEM((block, 4, n_y, n_x), dtype),
            pltpu.VMEM((seg_sl, 4, n_y, n_x), dtype),
            pltpu.VMEM((seg_sl, 4, n_y, n_x), dtype),
            pltpu.SMEM((views,), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pos, axv, bxv, grid_sc, dt_map, dbias, d_color, trans0, q0)
    del trans_fin, q_fin, rbuf
    return grad
