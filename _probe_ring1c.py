"""Minimal ring all-reduce pallas kernel probe (interpret mode)."""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import functools
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

D = 8
SEG = 8        # rows per segment
ROWS = D * SEG


def kernel(x_ref, out_ref, send_sem, recv_sem, wsem):
    i32 = jnp.int32
    my = jnp.asarray(jax.lax.axis_index("data"), i32)
    init = pltpu.make_async_copy(x_ref, out_ref, wsem)
    init.start()
    init.wait()
    R = 2 * (D - 1)
    for r in range(R):
        slot = r % 2
        seg = jax.lax.rem(my - i32(r) + i32(2 * D), i32(D))
        src = out_ref.at[pl.ds(seg * i32(SEG), SEG)]
        copy = pltpu.make_async_remote_copy(
            src_ref=src, dst_ref=src,
            send_sem=send_sem.at[slot], recv_sem=recv_sem.at[slot],
            device_id=jax.lax.rem(my + i32(1), i32(D)),
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        if r >= 2:
            copy.wait_send()
        if r < D - 1:
            copy.start()
        else:
            copy.start()
        copy.wait_recv()
    for slot in range(2):
        seg0 = out_ref.at[pl.ds(0, SEG)]
        pltpu.make_async_remote_copy(
            src_ref=seg0, dst_ref=seg0,
            send_sem=send_sem.at[slot], recv_sem=recv_sem.at[slot],
            device_id=my, device_id_type=pltpu.DeviceIdType.LOGICAL,
        ).wait_send()


def ring_allreduce(x):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA(())],
        interpret=pltpu.InterpretParams(dma_execution_mode='eager'),
    )(x)


mesh = Mesh(np.asarray(jax.devices()[:D]), ("data",))
x = jnp.arange(D * ROWS * 128, dtype=jnp.float32).reshape(D, ROWS, 128)
y = jax.shard_map(
    lambda v: ring_allreduce(v[0])[None],
    mesh=mesh, in_specs=P("data"), out_specs=P("data"),
    check_vma=False,
)(x)
y = np.asarray(y)
ref = np.asarray(x).sum(axis=0)
print("max err vs sum:", np.abs(y - ref[None]).max())
for d in range(D):
    np.testing.assert_allclose(y[d], ref, rtol=1e-6)
print("RING PROBE OK")
