"""Structured stdout logging (SURVEY.md §5: jsonl metrics, first-class
scenes/sec + mAP)."""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, Optional


class JsonlLogger:
    def __init__(self, path: Optional[str] = None, also_stdout: bool = True):
        self._fh = open(path, "a") if path else None
        self._stdout = also_stdout
        self._t0 = time.time()

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

    def close(self):
        if self._fh:
            self._fh.close()
