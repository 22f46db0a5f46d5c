"""Probe: does this TPU's VPU run bf16 elementwise at 2x the f32 rate?

Round-4 verdict item 3 names bf16 VPU arithmetic as the one untried lever
for the fused kernel's [B, K_pad] elementwise chain.  Before rewriting the
kernel, measure the raw effect: a ~12-op mul/add/select chain (shaped like
the conditional-product body) on [rows, 512] tiles, f32 vs bf16.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 1 << 15       # 32768 rows x 512 lanes
K = 512
TILE = 512
REPS = 8             # chain repeats inside the kernel


def _kernel(a_ref, b_ref, o_ref, *, dtype):
    x = a_ref[:].astype(dtype)
    y = b_ref[:].astype(dtype)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    e = (cols == 3).astype(dtype)
    acc = x
    for _ in range(REPS):
        # the fused kernel's body shape: sub, add-const, mul, fused corr
        acc = (acc - e + dtype(0.1)) * (y - e + dtype(0.5)) + acc * e
    o_ref[:] = acc.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("dtype",))
def run(a, b, dtype):
    return pl.pallas_call(
        functools.partial(_kernel, dtype=dtype),
        grid=(ROWS // TILE,),
        in_specs=[pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, K), jnp.float32),
    )(a, b)


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((ROWS, K), np.float32))
    b = jnp.asarray(rng.random((ROWS, K), np.float32))
    for name, dt in [("float32", jnp.float32), ("bfloat16", jnp.bfloat16)]:
        out = run(a, b, dt); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = run(a, b, dt)
        jax.block_until_ready(out)
        dt_s = (time.perf_counter() - t0) / 20
        ops = ROWS * K * REPS * 5  # ~5 VPU ops per rep per cell
        print(f"{name}: {dt_s*1e3:.3f} ms  ({ops/dt_s/1e12:.2f} Tops/s)")


if __name__ == "__main__":
    sys.exit(main())
