"""Measured verdicts for the SVI and SMC backends (round-3 verdict item 9).

SVI exists for corpora where full Gibbs sweeps are infeasible per unit time:
the honest test is held-out perplexity vs WALLCLOCK at a rung-5-shaped size,
same K, both on the real chip.  SMC's published claim is its memory wall:
per-particle count tables are [P, M, K] + [P, V, K]; this script measures its
throughput at a small scale and prints the ceiling formula at rung shapes.

Results are written into the backend docstrings + BASELINE.md by hand — this
script is the evidence generator (run on the TPU).

Usage: python scripts/backend_verdicts.py [svi|smc|both]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def svi_vs_gibbs():
    import jax

    from ldagibbssampling_tpu.backends.svi import SviModel
    from ldagibbssampling_tpu.config import LdaConfig
    from ldagibbssampling_tpu.corpus.flat import FlatCorpus
    from ldagibbssampling_tpu.data.synthetic import planted_topic_corpus
    from ldagibbssampling_tpu.evaluation.device_metrics import (
        heldout_perplexity_device)
    from ldagibbssampling_tpu.models.lda import LdaModel

    m_train, m_held = 10_000, 400
    v, k = 20_000, 50
    corpus, _ = planted_topic_corpus(m_train + m_held, v, k,
                                     mean_doc_len=100, seed=11)
    # doc split: first m_train train, rest held out
    ptr = corpus.doc_ptr
    t_cut = int(ptr[m_train])
    train = FlatCorpus(
        token_word=corpus.token_word[:t_cut],
        token_doc=corpus.token_doc[:t_cut],
        doc_ptr=ptr[: m_train + 1].copy(),
        vocab_size=v,
    )
    held = FlatCorpus(
        token_word=corpus.token_word[t_cut:],
        token_doc=corpus.token_doc[t_cut:] - m_train,
        doc_ptr=(ptr[m_train:] - t_cut).copy(),
        vocab_size=v,
    )
    print(f"# train: {train.num_tokens} tokens / {m_train} docs, "
          f"held: {held.num_tokens} tokens, V={v}, K={k}", flush=True)

    def eval_ppl(phi):
        return heldout_perplexity_device(phi, held, alpha=0.5, n_sweeps=15,
                                         seed=0)

    cfg = LdaConfig(topic_num=k, seed=0, block_size=65_536)
    gibbs = LdaModel(cfg, train)
    gibbs.sweep(1)  # compile
    jax.block_until_ready(gibbs.state.z)
    print(f"gibbs tier: {gibbs.kernel_tier}", flush=True)
    wall = 0.0
    for chunk in (2, 3, 5, 10, 20, 20):
        t0 = time.perf_counter()
        gibbs.sweep(chunk)
        jax.block_until_ready(gibbs.state.z)
        wall += time.perf_counter() - t0
        ppl = eval_ppl(gibbs.phi())
        print(f"gibbs  sweeps={gibbs.sweeps_done:4d} wall={wall:7.2f}s "
              f"heldout_ppl={ppl:9.2f}", flush=True)

    svi = SviModel(cfg, train, batch_size=256)
    # compile one epoch worth? first sweep includes compile; time separately
    t0 = time.perf_counter()
    svi.sweep(1)
    compile_and_first = time.perf_counter() - t0
    ppl = eval_ppl(svi.phi())
    print(f"svi    epochs={svi.sweeps_done:4d} wall={compile_and_first:7.2f}s"
          f" (incl compile) heldout_ppl={ppl:9.2f}", flush=True)
    wall = compile_and_first
    for chunk in (1, 2, 4, 8):
        t0 = time.perf_counter()
        svi.sweep(chunk)
        wall += time.perf_counter() - t0
        ppl = eval_ppl(svi.phi())
        print(f"svi    epochs={svi.sweeps_done:4d} wall={wall:7.2f}s "
              f"heldout_ppl={ppl:9.2f}", flush=True)


def smc_scale():
    import jax

    from ldagibbssampling_tpu.backends.smc import SmcModel
    from ldagibbssampling_tpu.config import LdaConfig
    from ldagibbssampling_tpu.data.synthetic import planted_topic_corpus

    m, v, k, p = 2_000, 5_000, 20, 16
    corpus, _ = planted_topic_corpus(m, v, k, mean_doc_len=80, seed=7)
    cfg = LdaConfig(topic_num=k, seed=0)
    model = SmcModel(cfg, corpus, num_particles=p)
    model.sweep(1)
    jax.block_until_ready(model.nwk)
    t0 = time.perf_counter()
    model.sweep(2)
    jax.block_until_ready(model.nwk)
    dt = (time.perf_counter() - t0) / 2
    tps = corpus.num_tokens / dt
    print(f"# smc P={p} M={m} V={v} K={k} T={corpus.num_tokens}: "
          f"{dt*1e3:.1f} ms/pass -> {tps/1e6:.2f}M tokens/s", flush=True)
    print("# memory wall (per-particle tables, f32):", flush=True)
    for (mm, vv, kk, pp) in [(300_000, 100_000, 100, 16),
                             (1_000_000, 100_000, 500, 16),
                             (8_200_000, 140_000, 1_000, 16)]:
        gb = pp * (mm * kk + vv * kk) * 4 / 1e9
        print(f"#   M={mm:>9,} V={vv:>8,} K={kk:>5} P={pp}: "
              f"{gb:,.0f} GB of count tables", flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    if what in ("svi", "both"):
        svi_vs_gibbs()
    if what in ("smc", "both"):
        smc_scale()
