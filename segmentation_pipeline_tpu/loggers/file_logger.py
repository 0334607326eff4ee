"""File-based experiment logger: JSONL metrics + checkpoints + images.

The framework's default observability path (the reference defaults to wandb,
loggers/wandb_logger.py:35; this environment-independent logger covers the
same duties: metric stream, checkpoint persistence with the every-N /
best-score policy, qualitative images, config snapshot). Optional
TensorBoard mirroring via tensorboardX.
"""
from __future__ import annotations

import json
import numbers
from datetime import datetime
from pathlib import Path

import numpy as np

from ..evaluators.labeled_tensor import LabeledTensor
from ..utils.misc import flatten_nested_dict
from .logger import Logger


def _to_loggable(value):
    """Flatten evaluator outputs into JSON scalars / file artifacts."""
    if isinstance(value, LabeledTensor):
        return value.to_dict()
    try:
        import pandas as pd

        if isinstance(value, pd.DataFrame):
            return json.loads(value.to_json(orient="records"))
    except ImportError:
        pass
    if isinstance(value, np.ndarray):
        return value.tolist()
    if isinstance(value, (np.floating, np.integer)):
        return value.item()
    if isinstance(value, dict):
        return {k: _to_loggable(v) for k, v in value.items()}
    return value


class FileLogger(Logger):
    def __init__(self, logs_dir: str, use_tensorboard: bool = False,
                 save_images: bool = True, async_saves: bool = True,
                 array_storage: str = "pickle"):
        self.logs_dir = logs_dir
        self.use_tensorboard = use_tensorboard
        self.save_images = save_images
        # 'orbax': checkpoint arrays go to an orbax OCDBT store next to the
        # pickle envelope (chunked tensorstore writes; the jax ecosystem's
        # production checkpoint format) — see Context.write_snapshot
        self.array_storage = array_storage
        # checkpoint writes happen on a single worker thread: the state is
        # snapshotted to host synchronously (cheap) and the pickle+disk write
        # (the slow part) overlaps with training
        self.async_saves = async_saves
        self._save_executor = None
        self._pending_save = None
        self.run_dir = None
        self.metrics_file = None
        self.tb_writer = None
        self.iteration = 0

    def setup(self, context):
        stamp = datetime.now().strftime("%y%m%d-%H%M%S")
        self.run_dir = Path(self.logs_dir) / f"{context.name}-{stamp}"
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.metrics_file = open(self.run_dir / "metrics.jsonl", "a")
        with open(self.run_dir / "config.json", "w") as f:
            json.dump(_to_loggable(context.get_config()), f, indent=2, default=str)
        if self.use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb_writer = SummaryWriter(str(self.run_dir / "tb"))
            except ImportError:
                self.tb_writer = None

    def save_context(self, context, folder: str, iteration: int):
        out_dir = self.run_dir / folder
        out_dir.mkdir(parents=True, exist_ok=True)
        path = out_dir / f"{context.name}-iter{iteration:08}.ckpt"
        if not self.async_saves:
            context.save(path, array_storage=self.array_storage)
            return path

        from concurrent.futures import ThreadPoolExecutor

        if self._save_executor is None:
            self._save_executor = ThreadPoolExecutor(max_workers=1)
        if self._pending_save is not None:
            self._pending_save.result()  # one write in flight at a time
        snapshot = context.snapshot()  # synchronous host materialization
        self._pending_save = self._save_executor.submit(
            type(context).write_snapshot, snapshot, path, self.array_storage)
        return path

    def log(self, log_dict: dict):
        # honor a caller-provided iteration (the trainer stamps its real one,
        # which survives resume) and fall back to a local counter
        iteration = log_dict.get("iteration", self.iteration)
        self.iteration = int(iteration)
        record = {"iteration": self.iteration}
        images = {}

        def walk(prefix, value):
            try:
                from PIL import Image as PILImage

                if isinstance(value, PILImage.Image):
                    images[prefix] = value
                    return None
            except ImportError:
                pass
            if isinstance(value, dict):
                out = {}
                for k, v in value.items():
                    w = walk(f"{prefix}.{k}" if prefix else str(k), v)
                    if w is not None:
                        out[k] = w
                return out
            return _to_loggable(value)

        payload = walk("", log_dict)
        record.update(payload if isinstance(payload, dict) else {"value": payload})
        self.metrics_file.write(json.dumps(record, default=str) + "\n")
        self.metrics_file.flush()

        if self.save_images and images:
            img_dir = self.run_dir / "images"
            img_dir.mkdir(exist_ok=True)
            for name, img in images.items():
                safe = name.replace("/", "_")
                img.save(img_dir / f"{safe}-iter{self.iteration:08}.png")

        if self.tb_writer is not None:
            flat = flatten_nested_dict(record)
            for key, value in flat.items():
                if isinstance(value, numbers.Number):
                    self.tb_writer.add_scalar(key, value, self.iteration)

        self.iteration += 1

    def close(self):
        if self._pending_save is not None:
            self._pending_save.result()
            self._pending_save = None
        if self._save_executor is not None:
            self._save_executor.shutdown(wait=True)
            self._save_executor = None
        if self.metrics_file is not None:
            self.metrics_file.close()
            self.metrics_file = None
        if self.tb_writer is not None:
            self.tb_writer.close()
            self.tb_writer = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
