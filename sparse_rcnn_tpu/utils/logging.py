"""Structured stdout logging (SURVEY.md §5: jsonl metrics, first-class
scenes/sec + mAP; optional TensorBoard scalar mirror)."""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, Optional


class JsonlLogger:
    """jsonl to stdout and/or a file; optionally mirrors numeric fields to
    TensorBoard as ``{kind}/{field}`` scalars (``tb_dir``).

    TensorBoard is an optional dependency: if the import fails the logger
    degrades to jsonl-only with a single warning line rather than raising
    (SURVEY §5 names TB as optional; jsonl is the contract).
    """

    def __init__(self, path: Optional[str] = None, also_stdout: bool = True,
                 tb_dir: Optional[str] = None):
        self._fh = open(path, "a") if path else None
        self._stdout = also_stdout
        self._t0 = time.time()
        self._tb = None
        self._n = 0
        if tb_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=tb_dir)
            except Exception as e:  # pragma: no cover - env without TB
                print(f'{{"kind": "warn", "msg": "tensorboard unavailable: '
                      f'{e!r} - jsonl only"}}', file=sys.stderr)

    def log(self, kind: str, **fields: Any) -> None:
        rec: Dict[str, Any] = {"kind": kind, "t": round(time.time() - self._t0, 3)}
        rec.update({
            k: (float(v) if hasattr(v, "item") else v) for k, v in fields.items()
        })
        line = json.dumps(rec)
        if self._stdout:
            print(line, flush=True)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self._tb is not None:
            self._n += 1
            step = rec.get("step")
            step = int(step) if isinstance(step, (int, float)) else self._n
            for k, v in rec.items():
                if k in ("kind", "t", "step"):
                    continue
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(f"{kind}/{k}", float(v), step)
            self._tb.flush()

    def close(self):
        if self._fh:
            self._fh.close()
        if self._tb is not None:
            self._tb.close()
