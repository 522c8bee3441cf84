"""Structured experiment logging + failure-tolerant hooks.

Equivalent of the reference LoggingUtils
(src/lightning/utils/logging_utils/logging_utils.py:10-104): nested metric
dict flattening, image logging, and the safe_operation decorator that
catches exceptions in epoch-end hooks, logs the traceback, and (on
multi-process runs) still hits the barrier so other hosts don't hang.
Backends: JSONL file (always), CSV (Lightning CSVLogger-style metrics.csv,
reference configs/logger/default.yaml csv option), TensorBoard via
flax.metric_writers when available, wandb when installed and enabled.
"""

from __future__ import annotations

import functools
import json
import os
import time
import traceback
from typing import Any, Dict, Optional

from boxdreamer_tpu.utils.log import ERROR, INFO


def flatten_metrics(tree: Dict, prefix: str = "") -> Dict[str, float]:
    """Flatten nested metric dicts to 'a/b/c' keys (reference
    log_nested_dict)."""
    out: Dict[str, float] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_metrics(v, key))
        else:
            try:
                out[key] = float(v)
            except (TypeError, ValueError):
                pass
    return out


class CSVWriter:
    """Lightning-CSVLogger-style metrics.csv: one row per log call, header
    is the union of keys seen so far. Rows are APPENDED (O(1) per call);
    only a header-growing record triggers a full rewrite, and that rewrite
    goes through a temp file + os.replace so a crash mid-flush can never
    lose the accumulated history (it either keeps the old file or lands the
    new one whole)."""

    def __init__(self, path: str):
        self.path = path
        self._fields = ["step", "time"]
        self._rows: list = []
        self._f = None  # open append handle; re-opened after each rewrite

    def append(self, rec: Dict[str, Any]):
        import csv

        new = [k for k in rec if k not in self._fields]
        self._rows.append(rec)
        if new or self._f is None:
            self._fields.extend(new)
            if self._f is not None:
                self._f.close()
            tmp = self.path + ".tmp"
            with open(tmp, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._fields)
                w.writeheader()
                w.writerows(self._rows)
            os.replace(tmp, self.path)
            self._f = open(self.path, "a", newline="")
        else:
            w = csv.DictWriter(self._f, fieldnames=self._fields)
            w.writerow(rec)
            self._f.flush()


class ExperimentLogger:
    """JSONL metric logger with optional CSV/TensorBoard/wandb backends."""

    def __init__(
        self,
        log_dir: str,
        use_tensorboard: bool = False,
        use_wandb: bool = False,
        wandb_project: Optional[str] = None,
        use_csv: bool = False,
        use_neptune: bool = False,
        neptune_project: Optional[str] = None,
    ):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._csv = (
            CSVWriter(os.path.join(log_dir, "metrics.csv")) if use_csv else None
        )
        self._tb = None
        self._wandb = None
        self._neptune = None
        if use_neptune:
            try:
                import neptune

                self._neptune = neptune.init_run(
                    project=neptune_project or "boxdreamer_tpu"
                )
            except Exception as e:  # noqa: BLE001
                ERROR(f"neptune unavailable: {e}")
        if use_tensorboard:
            try:
                from flax.metrics import tensorboard

                self._tb = tensorboard.SummaryWriter(log_dir)
            except Exception as e:  # noqa: BLE001
                ERROR(f"tensorboard writer unavailable: {e}")
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project=wandb_project or "boxdreamer_tpu",
                                         dir=log_dir)
            except Exception as e:  # noqa: BLE001
                ERROR(f"wandb unavailable: {e}")

    def log_metrics(self, metrics: Dict, step: int):
        flat = flatten_metrics(metrics)
        rec = {"step": step, "time": time.time(), **flat}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._csv is not None:
            self._csv.append(rec)
        if self._tb is not None:
            for k, v in flat.items():
                self._tb.scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(flat, step=step)
        if self._neptune is not None:
            for k, v in flat.items():
                self._neptune[k].append(v, step=step)

    def log_image(self, name: str, image, step: int):
        """image: PIL or HWC uint8 array; always dumped to disk, plus TB."""
        import numpy as np

        from boxdreamer_tpu.utils.vis import to_pil

        pil = to_pil(image)
        path = os.path.join(self.log_dir, f"{name.replace('/', '_')}_{step}.png")
        pil.save(path)
        if self._tb is not None:
            self._tb.image(name, np.asarray(pil), step)

    def close(self):
        self._jsonl.close()
        if self._csv is not None and self._csv._f is not None:
            self._csv._f.close()
            self._csv._f = None
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._neptune is not None:
            self._neptune.stop()


def safe_operation(exit_on_error: bool = False, barrier: bool = True):
    """Decorator: catch + log exceptions, optionally exit; always try the
    cross-process barrier so other hosts don't deadlock
    (reference safe_operation, logging_utils.py:69-104)."""

    def decorator(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except Exception:  # noqa: BLE001
                ERROR(f"safe_operation caught in {fn.__name__}:\n"
                      f"{traceback.format_exc()}")
                if exit_on_error:
                    raise SystemExit(1)
                return None
            finally:
                if barrier:
                    try:
                        from boxdreamer_tpu.parallel.comm import synchronize

                        synchronize()
                    except Exception:  # noqa: BLE001
                        pass

        return wrapper

    return decorator
