"""Benchmark: tokens resampled/s/chip at K=500 (the BASELINE.md north star).

Runs the blocked collapsed-Gibbs sweep on the real device (whatever jax
defaults to — the TPU under the driver, CPU if forced) over a synthetic
Zipf-distributed corpus sized like the reference ladder's mid rungs.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "tokens/s", "vs_baseline": N}

``vs_baseline`` is measured against the top of BASELINE.md's estimated serial
Java throughput at K=500 (~2·10^4 tokens/s on one x86 core — the generous end,
so the ratio is conservative).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# benchmark shape (overridable for smoke runs: bench.py [tokens] [topics])
NUM_TOKENS = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20   # ~1.05M
NUM_TOPICS = int(sys.argv[2]) if len(sys.argv) > 2 else 500
VOCAB = int(os.environ.get("LDA_BENCH_VOCAB", 50_000))
NUM_DOCS = int(os.environ.get("LDA_BENCH_DOCS", 4_096))
BLOCK_SIZE = int(os.environ.get("LDA_BENCH_BLOCK", 65_536))  # measured best at K=500 (fused)
TIMED_SWEEPS = int(os.environ.get("LDA_BENCH_SWEEPS", 100))  # long batches are the production steady state: 100 sweeps = 1.7 s timed, 60.6M tok/s vs 57.2M at 20 (the first dispatch of a window carries ~1 ms/sweep of fixed cost at short windows)
# Kernel tier (LDA_BENCH_PALLAS): "0" = pure-XLA sweep, "1" = v1 draw kernel
# (measured slower: the pallas_call boundary re-materializes the gathered
# [B,K] tiles), "fused" = v2 fused block kernel (doc-slab + topic totals +
# PRNG in VMEM), "deferred" = v3 deferred-nwk mode (fused kernel + per-sweep
# MXU count rebuild, no per-block [V,K] scatter) — the default on TPU.
_PALLAS_ENV = os.environ.get("LDA_BENCH_PALLAS", "deferred")
# [B, K] elementwise chain dtype inside the fused kernel.  bf16 runs the
# chain ~1.5x faster STANDALONE (scripts/vpu_dtype_probe.py, bf16_chain_
# bench.py) but loses ~10% end-to-end (measured 49.5-51.3M vs 55.4-55.8M
# f32 at this shape, 3 runs each): in the real loop the kernel overlaps the
# row gather and rebuild, so shrinking the VPU body just exposes them while
# the packed-bf16 relayouts at the kernel boundary add cost.  f32 default;
# the knob stays for other shapes.
COMPUTE_DTYPE = os.environ.get("LDA_BENCH_COMPUTE", "float32")
if COMPUTE_DTYPE not in ("float32", "bfloat16", "bf16p"):
    raise SystemExit(f"LDA_BENCH_COMPUTE={COMPUTE_DTYPE!r}: expected float32|bfloat16|bf16p")
USE_PALLAS = {"0": False, "1": True, "fused": "fused", "deferred": "deferred"}[_PALLAS_ENV]
# sweep-stale snapshot dtype for the deferred tier (bf16 default; the f32
# gather is 2x faster isolated but doubles the kernel-input HBM read)
MIRROR_DTYPE = os.environ.get("LDA_BENCH_MIRROR", "bfloat16")
if MIRROR_DTYPE not in ("bfloat16", "float32"):
    raise SystemExit(f"LDA_BENCH_MIRROR={MIRROR_DTYPE!r}: expected bfloat16|float32")
BASELINE_TOKENS_PER_S = 2e4  # BASELINE.md serial-Java estimate, upper end


def synth_corpus(t: int, v: int, m: int, seed: int = 0):
    """Zipf-ish synthetic corpus as flat arrays (no host ragged build at scale)."""
    rng = np.random.default_rng(seed)
    # word ids: Zipf(1.1) truncated to V — realistic skew for count gathers
    raw = rng.zipf(1.1, size=t).astype(np.int64)
    token_word = ((raw - 1) % v).astype(np.int32)
    # doc ids: contiguous equal-size docs
    token_doc = (np.arange(t, dtype=np.int64) * m // t).astype(np.int32)
    doc_lengths = np.bincount(token_doc, minlength=m).astype(np.int32)
    return token_word, token_doc, doc_lengths


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ldagibbssampling_tpu.models.state import init_state
    from ldagibbssampling_tpu.ops.gibbs import make_sweep_fn

    dev = jax.devices()[0]
    t = (NUM_TOKENS // BLOCK_SIZE) * BLOCK_SIZE
    tw, td, dl = synth_corpus(t, VOCAB, NUM_DOCS)
    use_pallas = USE_PALLAS if dev.platform == "tpu" else False

    if use_pallas == "deferred":
        # v3 layout: stripe-aligned blocks + per-sweep MXU count rebuild
        from ldagibbssampling_tpu.ops.count_kernel import plan_deferred

        plan = plan_deferred(tw, td, VOCAB, BLOCK_SIZE)
        tw, td, tm = plan.token_word, plan.token_doc, plan.token_mask
    else:
        plan = None
        tm = np.ones(t, dtype=np.int32)
        # within-block word sort: statistically free, enables the
        # sorted-scatter fast path (PaddedCorpus.sort_within_blocks)
        for s in range(0, t, BLOCK_SIZE):
            perm = np.argsort(tw[s : s + BLOCK_SIZE], kind="stable")
            tw[s : s + BLOCK_SIZE] = tw[s : s + BLOCK_SIZE][perm]
            td[s : s + BLOCK_SIZE] = td[s : s + BLOCK_SIZE][perm]

    state = init_state(
        tw, td, tm, num_docs=NUM_DOCS, vocab_size=VOCAB,
        num_topics=NUM_TOPICS, seed=0,
    )
    # TIMED_SWEEPS sweeps per run() call — the product's steady state
    # (runner.py batches unrecorded sweeps between metric checkpoints).
    # All tiers run the batch as an in-compilation fori_loop: the deferred
    # tier runs one cold dispatch (casts the [V, K] mirror) plus ONE batched
    # dispatch carrying the rebuild kernel's ride-along bf16 mirror in the
    # loop carry (round 5: per-sweep dispatches cost 1-3 ms each on the
    # remote platform)
    run = make_sweep_fn(
        tw, td, tm, dl, alpha=0.5, beta=0.1,
        block_size=BLOCK_SIZE, draw_method="gumbel", num_sweeps=TIMED_SWEEPS,
        use_pallas=use_pallas, sorted_words=True, num_topics=NUM_TOPICS,
        deferred_plan=plan, kernel_compute_dtype=COMPUTE_DTYPE,
        mirror_dtype=MIRROR_DTYPE,
    )

    # warmup / compile
    t0 = time.perf_counter()
    state = run(state)
    jax.block_until_ready(state.z)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    state = run(state)
    jax.block_until_ready(state.z)
    dt = time.perf_counter() - t0

    tokens_per_s = TIMED_SWEEPS * t / dt
    result = {
        "metric": f"tokens_resampled_per_s_chip_K{NUM_TOPICS}",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_s / BASELINE_TOKENS_PER_S, 2),
    }
    print(
        f"# device={dev.platform}:{dev} T={t} K={NUM_TOPICS} V={VOCAB} "
        f"block={BLOCK_SIZE} pallas={use_pallas} compute={COMPUTE_DTYPE} "
        f"compile={compile_s:.1f}s "
        f"timed={TIMED_SWEEPS} sweeps in {dt:.2f}s",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
