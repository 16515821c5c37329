"""Progress meter + structured metrics (SURVEY.md §5.1/§5.5).

The reference prints a reads/s ticker and an end-of-run summary to stderr;
we mirror that so wrapper scripts can diff, and add JSONL per-batch
metrics for observability.
"""

from __future__ import annotations

import json
import sys
import time


class Progress:
    """stderr ticker: elapsed, items processed, rate."""

    def __init__(self, what: str = "reads", out=None, interval_s: float = 1.0):
        self.what = what
        self.out = out if out is not None else sys.stderr
        self.interval = interval_s
        self.t0 = time.monotonic()
        self._last = 0.0
        self.n = 0

    def update(self, n_new: int) -> None:
        self.n += n_new
        now = time.monotonic()
        if now - self._last >= self.interval:
            self._last = now
            el = now - self.t0
            rate = self.n / el if el > 0 else 0.0
            print(f"\r{el:8.1f}s  {self.n:>12,} {self.what}  "
                  f"({rate:,.0f} {self.what}/s)", end="", file=self.out, flush=True)

    def done(self, extra: str = "") -> None:
        el = time.monotonic() - self.t0
        rate = self.n / el if el > 0 else 0.0
        print(f"\r{el:8.1f}s  {self.n:>12,} {self.what}  "
              f"({rate:,.0f} {self.what}/s) {extra}", file=self.out, flush=True)


class MetricsLogger:
    """Append-only JSONL metrics; no-op when path is None."""

    def __init__(self, path: str | None):
        self._f = open(path, "a") if path else None

    def log(self, **kv) -> None:
        if self._f:
            kv.setdefault("ts", time.time())
            self._f.write(json.dumps(kv) + "\n")
            self._f.flush()

    def close(self) -> None:
        if self._f:
            self._f.close()
