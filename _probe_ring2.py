"""Minimal remote-DMA probe: neighbor exchange via VMEM and HBM dsts."""
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


def mk(dst_space):
    def kernel(x_ref, out_ref, comm_ref, send_sem, recv_sem, wsem):
        i32 = jnp.int32
        my = jnp.asarray(jax.lax.axis_index("data"), i32)
        right = jax.lax.rem(my + i32(1), i32(D))
        copy = pltpu.make_async_remote_copy(
            src_ref=x_ref, dst_ref=comm_ref,
            send_sem=send_sem, recv_sem=recv_sem,
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        copy.start()
        copy.wait_send()
        copy.wait_recv()
        c = pltpu.make_async_copy(comm_ref, out_ref, wsem)
        c.start()
        c.wait()

    comm = (pltpu.VMEM((8, 128), jnp.float32) if dst_space == "vmem"
            else pltpu.HBM((8, 128), jnp.float32))
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[comm,
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        interpret=pltpu.InterpretParams(),
    )


mesh = Mesh(np.asarray(jax.devices()[:D]), ("data",))
x = jnp.arange(D * 8 * 128, dtype=jnp.float32).reshape(D, 8, 128)
for space in ("vmem", "hbm"):
    f = mk(space)
    y = jax.shard_map(
        lambda v: f(v[0])[None],
        mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        check_vma=False,
    )(x)
    y = np.asarray(y)
    ref = np.roll(np.asarray(x), 1, axis=0)  # device d gets d-1's data
    print(space, "max err:", np.abs(y - ref).max(),
          "got-own-data:", np.abs(y - np.asarray(x)).max() == 0)
