"""Structured JSONL metrics/observability (SURVEY.md §5 metrics row).

The reference logs with print() + matplotlib; here every stage emits typed
JSONL events (solve residuals, CG iterations, ROM rel-err, NN loss,
acceptance rate, ESS/sec) so runs are machine-comparable, and the BASELINE
figures of merit are first-class events.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional


class MetricsLogger:
    """Append-only JSONL event log with wall-clock stamps and a config echo."""

    def __init__(self, path: Optional[str | Path] = None, run_config: Optional[Dict[str, Any]] = None):
        self.path = Path(path) if path else None
        self.t0 = time.perf_counter()
        self.events: list[dict] = []
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
        if run_config is not None:
            self.log("run_config", **run_config)

    def log(self, event: str, **fields: Any) -> dict:
        rec = {"event": event, "t": round(time.perf_counter() - self.t0, 6), **fields}
        self.events.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec, default=_jsonable) + "\n")
        return rec

    def timer(self, event: str):
        return _Timer(self, event)

    def summary(self) -> Dict[str, Any]:
        """Last value per event name (simple CLI summarizer)."""
        out: Dict[str, Any] = {}
        for e in self.events:
            out[e["event"]] = {k: v for k, v in e.items() if k not in ("event",)}
        return out


class profile_trace:
    """Context manager around jax.profiler.trace (SURVEY.md §5 tracing row).

    with profile_trace("/tmp/jax-trace"):
        run_hot_path()
    then inspect with TensorBoard / xprof. No-op if profiling is unavailable.
    """

    def __init__(self, log_dir: str | Path):
        self.log_dir = str(log_dir)
        self._active = False

    def __enter__(self):
        try:
            import jax

            jax.profiler.start_trace(self.log_dir)
            self._active = True
        except Exception:
            self._active = False
        return self

    def __exit__(self, *exc):
        if self._active:
            import jax

            jax.profiler.stop_trace()
        return False


class _Timer:
    def __init__(self, logger: MetricsLogger, event: str):
        self.logger = logger
        self.event = event

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.logger.log(self.event, seconds=round(time.perf_counter() - self.start, 6))
        return False


def _jsonable(x):
    try:
        return float(x)
    except Exception:
        return str(x)
