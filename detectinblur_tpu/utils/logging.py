"""TensorBoard scalar logging, rank-0 only, path-wiped on start
(train.py:109-120 semantics). Falls back to a JSONL writer when
tensorboard is unavailable."""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Optional

from detectinblur_tpu.parallel.mesh import is_main_process


class ScalarWriter:
    def __init__(self, path: Optional[str], wipe: bool = True):
        self.writer = None
        self.jsonl = None
        if path is None or not is_main_process():
            return
        if wipe and os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(path)
        except Exception:
            self.jsonl = open(os.path.join(path, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, float(value), step)
        elif self.jsonl is not None:
            self.jsonl.write(json.dumps({"tag": tag, "value": float(value),
                                         "step": step, "ts": time.time()}) + "\n")
            self.jsonl.flush()

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self.jsonl is not None:
            self.jsonl.close()
