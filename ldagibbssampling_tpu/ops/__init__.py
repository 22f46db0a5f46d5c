"""Device ops: the vectorized blocked-Gibbs sweep (jnp) and Pallas TPU kernels."""

from ldagibbssampling_tpu.ops.gibbs import gibbs_sweep, make_sweep_fn

__all__ = ["gibbs_sweep", "make_sweep_fn"]
