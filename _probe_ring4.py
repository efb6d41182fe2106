"""Probe: sem-array .at[] indexing and traced slice offsets in remote DMA."""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

D = 8


def mk(case):
    def kernel(x_ref, out_ref, send_sem, recv_sem, wsem):
        i32 = jnp.int32
        my = jnp.asarray(jax.lax.axis_index("data"), i32)
        right = jax.lax.rem(my + i32(1), i32(D))
        init = pltpu.make_async_copy(x_ref, out_ref, wsem)
        init.start()
        init.wait()
        if case == "semarray":
            src = out_ref.at[pl.ds(0, 8)]
            copy = pltpu.make_async_remote_copy(
                src_ref=src, dst_ref=src,
                send_sem=send_sem.at[0], recv_sem=recv_sem.at[0],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
        elif case == "traced_off":
            off = jax.lax.rem(my * i32(0), i32(8))  # traced zero
            src = out_ref.at[pl.ds(off, 8)]
            copy = pltpu.make_async_remote_copy(
                src_ref=src, dst_ref=src,
                send_sem=send_sem.at[0], recv_sem=recv_sem.at[0],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
        copy.start()
        copy.wait_send()
        copy.wait_recv()

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA(())],
        interpret=pltpu.InterpretParams(),
    )


mesh = Mesh(np.asarray(jax.devices()[:D]), ("data",))
x = jnp.arange(D * 8 * 128, dtype=jnp.float32).reshape(D, 8, 128)
for case in ("semarray", "traced_off"):
    y = np.asarray(jax.shard_map(
        lambda v: mk(case)(v[0])[None],
        mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        check_vma=False,
    )(x))
    ref = np.roll(np.asarray(x), 1, axis=0)
    print(case, "err vs rolled:", np.abs(y - ref).max(),
          "vs own:", np.abs(y - np.asarray(x)).max())
