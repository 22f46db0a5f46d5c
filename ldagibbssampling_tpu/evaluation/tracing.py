"""Tracing, profiling, and structured metrics (SURVEY.md §5).

The reference's only observability is ``System.out.println("Iteration " + i)``
(``LdaModel.inferenceModel``, SURVEY.md §5 tracing row).  TPU-native
equivalents:

- :func:`trace` — ``jax.profiler`` trace capture around a region; the output
  directory is TensorBoard-ready (``tensorboard-plugin-profile``).
- :class:`SweepTimer` — per-sweep wall time and tokens-resampled/s counters
  with summary statistics (the BASELINE.md north-star metric).
- :class:`MetricsLog` — append-only JSONL of per-sweep scalars (log-likelihood,
  perplexity, throughput, hyperparameters, R̂) for dashboards and the
  benchmark harness.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Any, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str | Path) -> Iterator[None]:
    """Capture a ``jax.profiler`` device trace into ``log_dir``."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named trace region (shows up in the profiler timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def block_on_backend(backend) -> None:
    """Block until a backend's device state is committed.

    Dispatches are async: a timed ``sweep(chunk)`` without this measures
    ENQUEUE time, not compute (observed: metrics rows claiming 3.3e9
    tokens/s on a 52M-tokens/s chip).  One shared probe — the runner and the
    benchmark ladder must block identically, or a new backend silently
    reports enqueue-time throughput in one of them.
    """
    import jax

    for attr in ("state", "z", "gamma", "lam"):
        x = getattr(backend, attr, None)
        if x is not None and not callable(x):
            jax.block_until_ready(x)
            return
    chains = getattr(backend, "chains", None)
    if chains is not None:
        for attr in ("states", "z"):
            x = getattr(chains, attr, None)
            if x is not None and not callable(x):
                jax.block_until_ready(x)
                return


class SweepTimer:
    """Wall-clock per-sweep timing + tokens-resampled/s.

    Usage::

        timer = SweepTimer(num_tokens=corpus.num_tokens)
        for i in range(sweeps):
            with timer:
                model.sweep(1)
        print(timer.summary())
    """

    def __init__(self, num_tokens: int):
        self.num_tokens = num_tokens
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def __enter__(self) -> "SweepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        assert self._t0 is not None
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    @property
    def last_tokens_per_s(self) -> float:
        if not self.times:
            return float("nan")
        return self.num_tokens / max(self.times[-1], 1e-12)

    def summary(self) -> dict[str, float]:
        if not self.times:
            return {"sweeps": 0}
        # skip the first sweep (compile) for steady-state numbers when possible
        steady = self.times[1:] or self.times
        mean = sum(steady) / len(steady)
        return {
            "sweeps": len(self.times),
            "first_sweep_s": self.times[0],
            "mean_sweep_s": mean,
            "tokens_per_s": self.num_tokens / max(mean, 1e-12),
            "total_s": sum(self.times),
        }


class MetricsLog:
    """Append-only JSONL metrics sink (one object per line, ``sweep`` keyed)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a", encoding="utf-8")

    def log(self, sweep: int, **scalars: Any) -> None:
        rec = {"sweep": int(sweep), "time": time.time()}
        for k, v in scalars.items():
            if v is None:
                continue
            rec[k] = float(v) if isinstance(v, (int, float)) else v
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()

    def __enter__(self) -> "MetricsLog":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def read_metrics(path: str | Path) -> list[dict[str, Any]]:
    """Read a JSONL metrics file back (skips malformed lines)."""
    out = []
    p = Path(path)
    if not p.exists():
        return out
    for line in p.read_text(encoding="utf-8").splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            out.append(json.loads(line))
        except json.JSONDecodeError:
            continue
    return out
