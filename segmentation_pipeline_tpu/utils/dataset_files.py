"""Dataset staging for cluster runs.

Parity with ref utils/utils.py:150-184 prepare_dataset_files: if the dataset
path is a tar archive, extract it to a work directory (SLURM scratch);
if it is a directory and a work path is given, copy it there; otherwise use
in place.
"""
from __future__ import annotations

import shutil
import tarfile
from pathlib import Path


def prepare_dataset_files(dataset_path, work_path=None) -> Path:
    dataset_path = Path(dataset_path)
    if dataset_path.is_dir():
        if work_path is None:
            return dataset_path
        work_path = Path(work_path)
        target = work_path / dataset_path.name
        if not target.exists():
            work_path.mkdir(parents=True, exist_ok=True)
            shutil.copytree(dataset_path, target)
        return target

    if dataset_path.suffixes[-1:] == [".tar"] or dataset_path.name.endswith(
            (".tar.gz", ".tgz")):
        work_path = Path(work_path) if work_path else dataset_path.parent
        target = work_path / dataset_path.name.split(".")[0]
        if not target.exists():
            work_path.mkdir(parents=True, exist_ok=True)
            with tarfile.open(dataset_path) as tar:
                tar.extractall(work_path)
        return target

    raise ValueError(f"Dataset path {dataset_path} is neither a directory nor a tar archive")
