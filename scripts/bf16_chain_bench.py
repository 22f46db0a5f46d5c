"""Measure the fused kernel's [B, K] chain in f32 vs bf16 (verdict item 3).

Standalone kernel timing at the bench shape (block=65536, K=500->512,
row_tile=512, deferred mode: bf16 rows in, no delta out), 16 blocks/sweep.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ldagibbssampling_tpu.ops.pallas_gibbs import pallas_fused_block

B = 65536
KP = 512
K = 500
D_LOC = 128
BLOCKS = 16


def main():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, 500, (B, KP)).astype(np.float32)).astype(jnp.bfloat16)
    slab = jnp.asarray(rng.integers(0, 200, (D_LOC, KP)).astype(np.float32))
    nk = jnp.asarray(rng.integers(1000, 4000, (1, KP)).astype(np.float32))
    zold = jnp.asarray(rng.integers(0, K, B).astype(np.int32))
    dloc = jnp.asarray(rng.integers(0, D_LOC, B).astype(np.int32))
    msk = jnp.ones(B, jnp.int32)
    for cd in ("float32", "bfloat16"):
        def run():
            out = None
            for b in range(BLOCKS):
                out = pallas_fused_block(
                    rows, slab, nk, zold, dloc, msk, jnp.int32(b),
                    alpha=0.5, beta=0.1, vbeta=5000.0, k_real=K,
                    noise_mode="internal", row_tile=512, emit_delta=False,
                    slab_split=True, compute_dtype=cd)
            return out
        out = run(); jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        for _ in range(5):
            out = run()
        jax.block_until_ready(out[0])
        dt = (time.perf_counter() - t0) / 5
        print(f"{cd}: {dt*1e3:.2f} ms / {BLOCKS} blocks "
              f"({BLOCKS*B/dt/1e6:.1f}M tok/s standalone)")


if __name__ == "__main__":
    sys.exit(main())
