"""Fused Pallas TPU kernel for the per-token categorical draw.

This is the framework's native tier (SURVEY.md §2.2): the reference's hot loop
(``LdaModel.sampleTopicZ``) fused into one VMEM-resident pass.  For a block of
B tokens with gathered count rows, one kernel program per B-tile computes

    self-exclusion  (cols == z_old)                       — no one-hot in HBM
    conditional     log(nwk−e+β) + log(ndk−e+α) − log(nk−e+Vβ)
    noise           on-core PRNG bits → Gumbel            — never hits HBM
    draw            argmax over K

so the only HBM traffic is the two gathered [B,K] count tiles in and B topic
ids out — the jnp path additionally materializes the one-hot, three excluded
matrices, and a [B,K] Gumbel tensor.

Noise modes (static):
- internal (default): ``pltpu.prng_seed`` + ``prng_random_bits`` on-core —
  the production TPU path (unsupported by the CPU interpreter, which returns
  zero bits);
- external: caller passes uniform(0,1) noise ``[B,K]`` — used by the CPU
  distribution tests (chi-square vs the analytic conditional);
- deterministic: no noise — pure argmax of the conditional, the exact
  kernel-vs-jnp equality hook.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sample_kernel(
    seed_ref, hyper_ref, zold_ref, nwk_ref, ndk_ref, nk_ref, noise_ref, out_ref,
    *, k_real: int, noise_mode: str,
):
    bt, k_pad = nwk_ref.shape
    alpha = hyper_ref[0]   # SMEM scalars: traced hyperparameters (Minka updates
    beta = hyper_ref[1]    # change their values without recompiling the kernel)
    vbeta = hyper_ref[2]
    cols = jax.lax.broadcasted_iota(jnp.int32, (bt, k_pad), dimension=1)
    excl = (cols == zold_ref[:]).astype(jnp.float32)

    nwk = nwk_ref[:] - excl
    ndk = ndk_ref[:] - excl
    nk = nk_ref[:] - excl  # nk_ref broadcasts [1, K_pad] over rows

    score = (
        jnp.log(nwk + beta)
        + jnp.log(ndk + alpha)
        - jnp.log(nk + vbeta)
    )
    if noise_mode == "internal":
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        # int32 (Mosaic can't cast uint32->f32); low 24 bits -> uniform (0, 1)
        bits = pltpu.bitcast(pltpu.prng_random_bits((bt, k_pad)), jnp.int32)
        u = (bits & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
        score = score + (-jnp.log(-jnp.log(u)))
    elif noise_mode == "external":
        score = score + (-jnp.log(-jnp.log(noise_ref[:])))
    # else "deterministic": no noise
    # mask K padding
    score = jnp.where(cols < k_real, score, -1e30)
    out_ref[:] = jnp.argmax(score, axis=1, keepdims=True).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("k_real", "noise_mode", "interpret", "row_tile"),
)
def pallas_sample_block(
    nwk_rows: jax.Array,   # [B, K] float32 — gathered word-topic rows (raw, incl. self)
    ndk_rows: jax.Array,   # [B, K] float32 — gathered doc-topic rows (raw)
    nk: jax.Array,         # [K]    float32 — topic totals (raw)
    zold: jax.Array,       # [B]    int32
    seed: jax.Array,       # []     int32
    noise: Optional[jax.Array] = None,  # [B, K] uniforms, only for noise_mode="external"
    *,
    alpha,                 # [] f32 (or float) — traced hyperparameters
    beta,
    vbeta,
    k_real: int,
    noise_mode: str = "internal",
    interpret: bool = False,
    row_tile: int = 256,
) -> jax.Array:
    """Fused exclusion→conditional→Gumbel→argmax; returns znew [B] int32."""
    if noise_mode not in ("internal", "external", "deterministic"):
        raise ValueError(f"unknown noise_mode {noise_mode!r}")
    b, k = nwk_rows.shape
    k_pad = _round_up(k, 128)
    bt = min(row_tile, b)
    b_pad = _round_up(b, bt)

    def pad(x, rows, cols_to, value=0.0):
        return jnp.pad(
            x, ((0, rows - x.shape[0]), (0, cols_to - x.shape[1])),
            constant_values=value,
        )

    nwk_p = pad(nwk_rows.astype(jnp.float32), b_pad, k_pad)
    ndk_p = pad(ndk_rows.astype(jnp.float32), b_pad, k_pad)
    nk_p = jnp.pad(nk.astype(jnp.float32), (0, k_pad - k))[None, :]
    zold_p = jnp.pad(zold.astype(jnp.int32), (0, b_pad - b))[:, None]
    seed_arr = jnp.asarray(seed, jnp.int32)[None]
    hyper_arr = jnp.stack([
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(beta, jnp.float32),
        jnp.asarray(vbeta, jnp.float32),
    ])
    if noise_mode == "external":
        if noise is None:
            raise ValueError("noise_mode='external' requires a noise array")
        noise_p = pad(noise.astype(jnp.float32), b_pad, k_pad, value=0.5)
    else:
        # dummy 1-tile placeholder; never read by the kernel
        noise_p = jnp.full((bt, k_pad), 0.5, jnp.float32)

    grid = (b_pad // bt,)
    noise_index = (lambda i: (i, 0)) if noise_mode == "external" else (lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(
            _sample_kernel, k_real=k_real, noise_mode=noise_mode,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                      # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),                      # (α, β, Vβ)
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, k_pad), noise_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),
        interpret=interpret,
    )(seed_arr, hyper_arr, zold_p, nwk_p, ndk_p, nk_p, noise_p)
    return out[:b, 0]
