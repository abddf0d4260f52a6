"""Torch-free training-metrics logging.

`JsonlLogger` mirrors the scalar-writer surface the algorithms use
(`add_scalar(tag, value, step)`) and appends one JSON object per step to
`<run_path>/metrics.jsonl`. It is the fallback when TensorBoard (a torch
extra in this stack) is unavailable, and can be combined with it via
`MultiWriter`. Replaces the reference's TensorBoard-only observability
(reference rl/synthesis.py:129-132).
"""

from __future__ import annotations

import json
import os
from typing import Optional


class JsonlLogger:
    """Buffers scalars per step and appends one JSON line per flushed step:
    {"step": N, "<tag>": value, ...}. Lines are flushed when a scalar for a
    NEWER step arrives, and on close()."""

    def __init__(self, run_path: str, filename: str = "metrics.jsonl"):
        os.makedirs(run_path, exist_ok=True)
        self.path = os.path.join(run_path, filename)
        self._step: Optional[int] = None
        self._row: dict = {}
        self._fh = open(self.path, "a", buffering=1)

    def add_scalar(self, tag: str, value, step: int) -> None:
        if self._step is not None and step != self._step:
            self._flush()
        self._step = step
        self._row[tag] = float(value)

    def _flush(self) -> None:
        if self._step is not None and self._row:
            self._fh.write(
                json.dumps({"step": self._step, **self._row}) + "\n"
            )
        self._row = {}

    def flush(self) -> None:
        """Write the buffered step now (e.g. at the end of learn())."""
        self._flush()
        self._step = None
        self._fh.flush()

    def close(self) -> None:
        self._flush()
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class MultiWriter:
    """Fan-out add_scalar to several writers (e.g. TensorBoard + JSONL)."""

    def __init__(self, *writers):
        self.writers = [w for w in writers if w is not None]

    def add_scalar(self, tag: str, value, step: int) -> None:
        for w in self.writers:
            w.add_scalar(tag, value, step)

    def flush(self) -> None:
        for w in self.writers:
            if hasattr(w, "flush"):
                w.flush()

    def close(self) -> None:
        for w in self.writers:
            if hasattr(w, "close"):
                w.close()
