"""Real-chip smoke validation (run manually: ``python scripts/tpu_smoke.py``).

The pytest suite forces an 8-device virtual CPU mesh (tests/conftest.py), so
the checks that need the actual TPU live here:

1. blocked sweep on chip: invariants + determinism per seed;
2. fused Pallas kernel with ON-CORE PRNG: chi-square of its draws against
   the analytic collapsed conditional (the CPU interpreter cannot run
   ``pltpu.prng_random_bits``, so this is the only place the production
   noise path is validated);
3. sorted-scatter fast path: sorted and unsorted layouts agree statistically;
4. a jax.profiler trace capture round-trip (SURVEY.md §5 tracing row).

Prints one PASS/FAIL line per check; exits non-zero on any failure.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

# runnable as `python scripts/tpu_smoke.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print(f"SKIP: first device is {dev.platform}, not tpu")
        return 0

    failures = 0

    def check(name: str, fn) -> None:
        nonlocal failures
        try:
            fn()
            print(f"PASS {name}")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL {name}: {e!r}")

    # ---------------------------------------------------------------- 1
    def sweep_invariants():
        from ldagibbssampling_tpu.config import LdaConfig
        from ldagibbssampling_tpu.corpus.flat import FlatCorpus
        from ldagibbssampling_tpu.models.lda import LdaModel
        from ldagibbssampling_tpu.models.state import check_invariants

        rng = np.random.default_rng(0)
        ragged = [[int(x) for x in rng.integers(0, 200, size=60)] for _ in range(64)]
        corpus = FlatCorpus.from_ragged(ragged, vocab_size=200)
        cfg = LdaConfig(topic_num=16, seed=3, block_size=512)
        m = LdaModel(cfg, corpus)
        m.sweep(5)
        check_invariants(m.state, m._padded.token_mask, m.doc_lengths)
        z1 = m.z()
        m2 = LdaModel(cfg, corpus)
        m2.sweep(5)
        np.testing.assert_array_equal(z1, m2.z())  # deterministic per seed

    # ---------------------------------------------------------------- 2
    def pallas_chi_square():
        from ldagibbssampling_tpu.ops.pallas_gibbs import pallas_sample_block

        k = 8
        b = 4096
        rng = np.random.default_rng(1)
        nwk = jnp.asarray(rng.integers(1, 50, size=(b, k)).astype(np.float32))
        ndk = jnp.asarray(rng.integers(1, 50, size=(b, k)).astype(np.float32))
        nk = jnp.asarray(rng.integers(200, 400, size=k).astype(np.float32))
        zold = jnp.asarray(rng.integers(0, k, size=b).astype(np.int32))
        beta, alpha, vbeta = 0.1, 0.5, 20.0

        draws = []
        for seed in range(8):
            z = pallas_sample_block(
                nwk, ndk, nk, zold, jnp.int32(seed * 7919),
                alpha=alpha, beta=beta, vbeta=vbeta, k_real=k,
                noise_mode="internal",
            )
            draws.append(np.asarray(z))
        zs = np.concatenate(draws)

        # analytic conditional for row 0 (all rows share one chi-square via
        # aggregation over identical-index draws is messy; instead aggregate
        # expected counts across all rows x seeds)
        cols = np.arange(k)[None, :]
        excl = (cols == np.asarray(zold)[:, None]).astype(np.float32)
        p = (np.asarray(nwk) - excl + beta) * (np.asarray(ndk) - excl + alpha) / (
            np.asarray(nk)[None, :] - excl + vbeta
        )
        p /= p.sum(axis=1, keepdims=True)
        expected = np.tile(p, (8, 1)).sum(axis=0)  # expected count per topic
        observed = np.bincount(zs, minlength=k).astype(np.float64)
        chi2 = float(((observed - expected) ** 2 / np.maximum(expected, 1e-9)).sum())
        # k-1 dof per-row aggregated: loose bound — catches broken PRNG/conditional
        assert chi2 < 10 * k, f"chi2={chi2:.1f} (expected O({k}))"

    # ---------------------------------------------------------------- 3
    def sorted_agrees():
        from ldagibbssampling_tpu.config import LdaConfig
        from ldagibbssampling_tpu.corpus.flat import FlatCorpus
        from ldagibbssampling_tpu.evaluation.metrics import perplexity
        from ldagibbssampling_tpu.models.lda import LdaModel

        rng = np.random.default_rng(5)
        ragged = [[int(x) for x in rng.integers(0, 300, size=80)] for _ in range(80)]
        corpus = FlatCorpus.from_ragged(ragged, vocab_size=300)
        ps = []
        for sort in (True, False):
            cfg = LdaConfig(topic_num=10, seed=4, block_size=1024, sort_blocks=sort)
            m = LdaModel(cfg, corpus)
            m.sweep(30)
            ps.append(perplexity(m.phi(), m.theta(), corpus))
        rel = abs(ps[0] - ps[1]) / ps[1]
        assert rel < 0.1, f"sorted vs unsorted perplexity gap {rel:.3f}"

    # ---------------------------------------------------------------- 4
    def profiler_trace():
        from ldagibbssampling_tpu.evaluation.tracing import trace

        with tempfile.TemporaryDirectory() as d:
            with trace(d):
                x = jnp.ones((512, 512)) @ jnp.ones((512, 512))
                jax.block_until_ready(x)
            import os

            found = any(
                f.endswith((".pb", ".json.gz", ".xplane.pb"))
                for _, _, files in os.walk(d)
                for f in files
            )
            assert found, "no trace files written"

    # ---------------------------------------------------------------- 5
    def fused_kernel_parity():
        """The production fused kernel (exp-race draw with APPROXIMATE
        reciprocals + on-core PRNG) must match the seeded oracle's held-in
        perplexity within MC error — the quality gate for the fast path.
        Measured 2026-08-18: fused gap 0.85%, XLA-path gap 1.28%."""
        import statistics

        from ldagibbssampling_tpu.config import LdaConfig
        from ldagibbssampling_tpu.corpus.documents import Documents
        from ldagibbssampling_tpu.corpus.flat import FlatCorpus
        from ldagibbssampling_tpu.data import write_minicorpus
        from ldagibbssampling_tpu.evaluation.metrics import perplexity
        from ldagibbssampling_tpu.models.lda import LdaModel
        from ldagibbssampling_tpu.models.oracle import OracleSampler

        with tempfile.TemporaryDirectory() as d:
            docs = Documents().read_docs(write_minicorpus(d + "/docs", num_docs=20))
        fc = FlatCorpus.from_documents(docs)
        sweeps = 200
        opp, fpp = [], []
        for seed in (0, 1, 2):
            o = OracleSampler(fc, 10, 0.5, 0.1, seed=seed)
            o.sweep(sweeps)
            opp.append(perplexity(o.phi(), o.theta(), fc))
            m = LdaModel(
                LdaConfig(topic_num=10, block_size=256, seed=seed,
                          use_pallas="fused"), fc)
            m.sweep(sweeps)
            fpp.append(perplexity(m.phi(), m.theta(), fc))
        gap = abs(statistics.mean(fpp) - statistics.mean(opp)) / statistics.mean(opp)
        assert gap < 0.05, f"fused-vs-oracle perplexity gap {gap:.3f}"

    check("sweep invariants + determinism on chip", sweep_invariants)
    check("pallas kernel on-core PRNG chi-square", pallas_chi_square)
    check("sorted-scatter path statistical agreement", sorted_agrees)
    check("jax.profiler trace capture", profiler_trace)
    check("fused kernel statistical parity vs oracle", fused_kernel_parity)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
