"""Repeated PatchPredict sweep: device-resident input cache vs re-upload.

Models the scheduled validation sweep over a PRELOADED validation set
(trainer.py preload_validation_data): the same subjects are predicted every
interval, so with ``cache_inputs`` the per-volume host->device upload
(~40 MB bf16 at msseg2 scale — ~0.8 s on this rig's 25 MB/s tunnel) is paid
once instead of every sweep.

Usage: python benchmarks/bench_patchpredict_cache.py
Env: SUBJECTS (default 3), SWEEPS (default 3), SHAPE (default 240,240,176),
     CACHE (unset = bench both).
"""
import copy
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.models import ModularUNet
from segmentation_pipeline_tpu.models.components import (BlurConv3d,
                                                         BlurConvTranspose3d)
from segmentation_pipeline_tpu.training.model import SegModel


def make_subjects(n, shape):
    rng = np.random.default_rng(0)
    subjects = []
    for i in range(n):
        x = rng.normal(size=(2, *shape)).astype(np.float32)
        s = sp.Subject({"name": f"s{i}",
                        "X": sp.ScalarImage(tensor=x)})
        subjects.append(s)
    return subjects


def main():
    shape = tuple(int(v) for v in
                  os.environ.get("SHAPE", "240,240,176").split(","))
    n_subjects = int(os.environ.get("SUBJECTS", "3"))
    sweeps = int(os.environ.get("SWEEPS", "3"))

    # msseg2 model (ref research/msseg2/msseg2.py:84-93) in bf16
    model = SegModel(ModularUNet(
        in_channels=2, out_channels=2, depth=6,
        filters=[40, 40, 80, 80, 120, 120],
        block_params={"residual": True},
        downsample_class=BlurConv3d,
        downsample_params={"kernel_size": 3, "stride": 2, "padding": 1},
        upsample_class=BlurConvTranspose3d,
        upsample_params={"kernel_size": 3, "stride": 2, "padding": 1,
                         "output_padding": 0},
        remat=True), seed=0, compute_dtype="bfloat16")

    subjects = make_subjects(n_subjects, shape)
    modes = ([os.environ["CACHE"] == "1"] if "CACHE" in os.environ
             else [False, True])
    for cache in modes:
        pred = sp.PatchPredict(
            image_names=["X"], patch_size=(96, 96, 96), patch_overlap=12,
            patch_batch_size=8, padding_mode="edge", device_argmax=True,
            cache_inputs=cache)
        times = []
        for sweep in range(sweeps + 1):  # sweep 0 = compile + first upload
            t = time.time()
            pred.predict(model, [copy.deepcopy(s) for s in subjects],
                         label_attributes={})
            dt = time.time() - t
            if sweep > 0:
                times.append(dt)
            print(f"cache_inputs={cache} sweep {sweep}: {dt:.2f}s "
                  f"({dt / n_subjects:.2f}s/volume)", flush=True)
        mean = sum(times) / len(times)
        print(f"RESULT cache_inputs={cache}: {mean:.2f}s/sweep, "
              f"{mean / n_subjects:.2f}s/volume over {sweeps} warm sweeps",
              flush=True)


if __name__ == "__main__":
    main()
