"""Isolate TPU arithmetic error sources: exp vs HIGHEST-precision dot."""
import numpy as np
import jax
import jax.numpy as jnp

cpu = jax.devices("cpu")[0]
tpu = jax.devices()[0]

# exp over the attenuation argument range (sigma*dt in [0, ~6])
x = np.linspace(0.0, 6.0, 200001, dtype=np.float32)
ref = np.exp(-x.astype(np.float64))
for dev, name in [(tpu, "tpu"), (cpu, "cpu")]:
    y = np.asarray(jax.jit(lambda v: jnp.exp(-v), device=dev)(
        jax.device_put(x, dev)))
    err = np.abs(y.astype(np.float64) - ref)
    # relative to exp value (abs error in att units)
    print(f"exp(-x) {name}: max abs err {err.max():.3e} "
          f"max rel {np.max(err / ref):.3e}")

# HIGHEST dot: tent-matrix-like operands
rng = np.random.default_rng(0)
a = np.maximum(0, 1 - np.abs(rng.uniform(-2, 2, (32, 24)))).astype(np.float32)
b = rng.uniform(0, 1, (24, 32)).astype(np.float32)
ref_d = a.astype(np.float64) @ b.astype(np.float64)
for prec in ("highest", "default"):
    p = (jax.lax.Precision.HIGHEST if prec == "highest"
         else jax.lax.Precision.DEFAULT)
    for dev, name in [(tpu, "tpu"), (cpu, "cpu")]:
        y = np.asarray(jax.jit(
            lambda u, v: jnp.dot(u, v, precision=p), device=dev
        )(jax.device_put(a, dev), jax.device_put(b, dev)))
        err = np.abs(y.astype(np.float64) - ref_d)
        print(f"dot {prec} {name}: max abs err {err.max():.3e}")

# multiply / subtract chains (VPU basic arithmetic should be exact f32)
c = rng.uniform(0.1, 1.0, 100000).astype(np.float32)
d = rng.uniform(0.1, 1.0, 100000).astype(np.float32)
ref_m = c.astype(np.float64) * d.astype(np.float64)
for dev, name in [(tpu, "tpu"), (cpu, "cpu")]:
    y = np.asarray(jax.jit(lambda u, v: u * v, device=dev)(
        jax.device_put(c, dev), jax.device_put(d, dev)))
    print(f"mul {name}: max abs err "
          f"{np.max(np.abs(y.astype(np.float64) - ref_m)):.3e}")
