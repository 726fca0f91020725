"""Observability: structured metrics, throughput counters, profiling.

The reference's only observability is stdout progress + acceptance
ratios [SURVEY.md §5].  Here:

- `MetricsLogger` writes structured JSONL (one object per window) with
  samples/sec, logpost-evals/sec, acceptance, R-hat/ESS summaries — the
  BASELINE.json:2 north-star counters.
- `profile_trace` wraps a region in a jax.profiler trace (xplane dump
  loadable in TensorBoard/XProf) — the `--profile` flag plan.
- `named_scope` re-exports jax.named_scope so model components annotate
  HLO for profile readability.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Any, IO

import jax

named_scope = jax.named_scope


class MetricsLogger:
    """Append-only JSONL metrics stream with wall-clock deltas."""

    def __init__(self, path: str | None = None, stream: IO | None = None):
        self._fh = open(path, "a") if path else stream
        self._t0 = time.perf_counter()
        self._last = self._t0

    def log(self, event: str, **fields: Any) -> dict:
        now = time.perf_counter()
        rec = dict(
            event=event,
            t=round(now - self._t0, 4),
            dt=round(now - self._last, 4),
            **{
                k: (float(v) if hasattr(v, "item") else v)
                for k, v in fields.items()
            },
        )
        self._last = now
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        return rec

    def throughput(
        self, event: str, n_samples: int, n_evals: int, seconds: float,
        **extra: Any,
    ) -> dict:
        """The north-star counters: samples/sec and evals/sec."""
        return self.log(
            event,
            samples_per_sec=n_samples / max(seconds, 1e-9),
            evals_per_sec=n_evals / max(seconds, 1e-9),
            wall_s=seconds,
            **extra,
        )

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_guards(enable: bool = True):
    """Debug-mode numeric guards (SURVEY.md §5 race/sanitizer analog):
    NaN debugging for the pure-functional pipeline."""
    if not enable:
        yield
        return
    old_nans = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
