"""Bisect the ring probe: run only the first NROUNDS rounds."""
import os, sys
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
SEG = 8
ROWS = D * SEG
NROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 1


def kernel(x_ref, out_ref, send_sem, recv_sem, wsem):
    i32 = jnp.int32
    my = jnp.asarray(jax.lax.axis_index("data"), i32)
    init = pltpu.make_async_copy(x_ref, out_ref, wsem)
    init.start()
    init.wait()
    for r in range(NROUNDS):
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
        copy.start()
        copy.wait_recv()
    # retire outstanding sends
    for r in range(max(0, NROUNDS - 2), NROUNDS):
        slot = r % 2
        seg0 = out_ref.at[pl.ds(0, SEG)]
        pltpu.make_async_remote_copy(
            src_ref=seg0, dst_ref=seg0,
            send_sem=send_sem.at[slot], recv_sem=recv_sem.at[slot],
            device_id=jnp.asarray(0, jnp.int32),
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        ).wait_send()


f = pl.pallas_call(
    kernel,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
    out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
    scratch_shapes=[pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA(())],
    interpret=pltpu.InterpretParams(),
)
mesh = Mesh(np.asarray(jax.devices()[:D]), ("data",))
x = jnp.arange(D * ROWS, dtype=jnp.float32).reshape(D, ROWS)
x = jnp.broadcast_to(x[:, :, None], (D, ROWS, 128)).copy()
y = np.asarray(jax.shard_map(
    lambda v: f(v[0])[None],
    mesh=mesh, in_specs=P("data"), out_specs=P("data"),
    check_vma=False,
)(x))
xn = np.asarray(x)
print("NROUNDS", NROUNDS)
for d in range(min(D, 3)):
    changed = [s for s in range(D)
               if np.abs(y[d, s*SEG:(s+1)*SEG] -
                         xn[d, s*SEG:(s+1)*SEG]).max() > 0]
    print(f"dev {d}: segs changed {changed}",
          "vals seg", changed[0] if changed else None,
          y[d, changed[0]*SEG, 0] if changed else "-")
