"""Symmetric Dirichlet hyperparameter optimization (Minka fixed-point).

The reference has NO hyperparameter learning (SURVEY.md §8.4) — α, β are fixed
knobs.  This is the BASELINE.json config-4 obligation ("α/β optimization via
collectives").  Standard Minka (2000) fixed-point updates on the collapsed
count tables, computed with ``digamma`` sums on device:

    α ← α · Σ_{m,k} [Ψ(ndk+α) − Ψ(α)] / (K · Σ_m [Ψ(N_m+Kα) − Ψ(Kα)])
    β ← β · Σ_{w,k} [Ψ(nwk+β) − Ψ(β)] / (V · Σ_k [Ψ(nk+Vβ) − Ψ(Vβ)])

In the sharded runtime ``ndk`` lives per-shard; the numerator/denominator sums
are shard-local and reconciled with one ``psum`` each — ``sharded_alpha_update``
is the shard_map-ready form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import digamma


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_alpha(ndk: jax.Array, doc_lengths: jax.Array, alpha: jax.Array,
                   iters: int = 5) -> jax.Array:
    """Minka fixed-point for symmetric α given doc-topic counts [M, K]."""
    k = ndk.shape[1]
    ndk = ndk.astype(jnp.float32)
    lengths = doc_lengths.astype(jnp.float32)

    def step(_, a):
        num = jnp.sum(digamma(ndk + a) - digamma(a))
        den = k * jnp.sum(digamma(lengths + k * a) - digamma(k * a))
        a_new = a * num / jnp.maximum(den, 1e-30)
        return jnp.clip(a_new, 1e-6, 1e3)

    return lax.fori_loop(0, iters, step, jnp.asarray(alpha, jnp.float32))


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_beta(nwk: jax.Array, nk: jax.Array, beta: jax.Array,
                  iters: int = 5) -> jax.Array:
    """Minka fixed-point for symmetric β given word-topic counts [V, K]."""
    v = nwk.shape[0]
    nwk = nwk.astype(jnp.float32)
    nk = nk.astype(jnp.float32)

    def step(_, b):
        num = jnp.sum(digamma(nwk + b) - digamma(b))
        den = v * jnp.sum(digamma(nk + v * b) - digamma(v * b))
        b_new = b * num / jnp.maximum(den, 1e-30)
        return jnp.clip(b_new, 1e-8, 1e3)

    return lax.fori_loop(0, iters, step, jnp.asarray(beta, jnp.float32))


def sharded_alpha_update(ndk_local: jax.Array, doc_lengths_local: jax.Array,
                         alpha: jax.Array, axis: str, iters: int = 5) -> jax.Array:
    """Minka α update inside ``shard_map``: psum-reconciled numerator/denominator.

    ``ndk_local`` / ``doc_lengths_local`` are this shard's documents (padding
    docs must have length 0 — they contribute Ψ(α)−Ψ(α)=0 to the numerator and
    are masked from the denominator).
    """
    k = ndk_local.shape[1]
    ndk = ndk_local.astype(jnp.float32)
    lengths = doc_lengths_local.astype(jnp.float32)
    real = (lengths > 0).astype(jnp.float32)

    a = jnp.asarray(alpha, jnp.float32)
    for _ in range(iters):
        num = lax.psum(jnp.sum(digamma(ndk + a) - digamma(a)), axis)
        den_local = jnp.sum(real * (digamma(lengths + k * a) - digamma(k * a)))
        den = k * lax.psum(den_local, axis)
        a = jnp.clip(a * num / jnp.maximum(den, 1e-30), 1e-6, 1e3)
    return a


def sharded_beta_update(
    nwk_local: jax.Array, nk: jax.Array, beta: jax.Array, axis: str,
    v_global: int, iters: int = 5,
) -> jax.Array:
    """Minka β update inside ``shard_map`` over a vocab-sharded ``nwk`` slab.

    ``nwk_local`` is this shard's ``[V_s, K]`` slab (zero padding rows
    contribute Ψ(β)−Ψ(β)=0 to the numerator); ``nk`` is the replicated topic
    total, so only the numerator needs a ``psum``.  ``v_global`` is the FULL
    vocabulary size — the slab height is neither V nor the smoothing mass.
    """
    nwk = nwk_local.astype(jnp.float32)
    nk = nk.astype(jnp.float32)
    b = jnp.asarray(beta, jnp.float32)
    for _ in range(iters):
        num = lax.psum(jnp.sum(digamma(nwk + b) - digamma(b)), axis)
        den = v_global * jnp.sum(digamma(nk + v_global * b) - digamma(v_global * b))
        b = jnp.clip(b * num / jnp.maximum(den, 1e-30), 1e-8, 1e3)
    return b
