"""Fused device post-processing vs host chain on the 240^3 inference sweep.

The production cleanup (ref research/dmri_hippo/hippo_inference.py:45-50 /
run_inference.py:141: remove_holes(64) then keep_components(1)) can run
either on the fetched ids with the native C++ CCL (host path,
post_processing.py) or fused on device before the bit-packed ids fetch
(PatchPredict(device_postprocess=[...]), ops/morphology.py). This bench
times both ends of the same PatchPredict sweep.

Usage: python benchmarks/bench_device_postprocess.py
Env: SUBJECTS (default 3), SWEEPS (default 3), SHAPE (default 240,240,176),
     MODE (host | device | unset = both),
     MODEL (threshold | unet, default threshold).

Post-processing cost depends on COMPONENT STRUCTURE, not just voxel
count. MODEL=threshold emits a realistic segmentation (one organ-scale
blob with punched holes + a few dozen small islands — what a trained
model produces); MODEL=unet runs an untrained depth-6 UNet whose argmax
is adversarial SPECKLE (~millions of components), which overstates both
paths and at 240^3 once crashed the TPU worker through the pre-hoisting
device program (PARITY.md "Fused device post-processing").
"""
import copy
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.models import ModularUNet
from segmentation_pipeline_tpu.models.components import (BlurConv3d,
                                                         BlurConvTranspose3d)
from segmentation_pipeline_tpu.post_processing import (keep_components,
                                                       remove_holes)
from segmentation_pipeline_tpu.training.model import SegModel

POST = [("remove_holes", 64), ("keep_components", 1)]


def make_subjects(n, shape):
    rng = np.random.default_rng(0)
    subjects = []
    for i in range(n):
        x = rng.normal(scale=0.3, size=(2, *shape)).astype(np.float32)
        # an organ-scale blob with punched holes + a few dozen small
        # islands: realistic work for hole fill / component keeping
        cx, cy, cz = (s // 2 for s in shape)
        x[:, cx - 40:cx + 40, cy - 40:cy + 40, cz - 30:cz + 30] += 4.0
        for _ in range(24):  # interior holes (<= 64 voxels each)
            hx, hy, hz = (rng.integers(-30, 27) + c for c in (cx, cy, cz))
            x[:, hx:hx + 3, hy:hy + 3, hz:hz + 3] -= 4.0
        for _ in range(48):  # scattered small islands
            px = [rng.integers(2, s - 4) for s in shape]
            x[:, px[0]:px[0] + 2, px[1]:px[1] + 2, px[2]:px[2] + 2] += 4.0
        subjects.append(sp.Subject({"name": f"s{i}",
                                    "X": sp.ScalarImage(tensor=x)}))
    return subjects


def threshold_model(x):
    """Stand-in for a TRAINED model: fg where the (blob-structured) input
    is hot — realistic component structure for the cleanup to chew on."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    fg = (x[:, 0:1] > 2.0).astype(jnp.float32)
    return jnp.concatenate([1 - fg, fg], axis=1)


def run(subjects, model, device_post, sweeps):
    pred = sp.PatchPredict(
        image_names=["X"], patch_size=(96, 96, 96), patch_overlap=12,
        patch_batch_size=8, padding_mode="edge", device_argmax=True,
        device_postprocess=POST if device_post else None)
    times = []
    for sweep in range(sweeps + 1):  # sweep 0 = compile
        subs = [copy.deepcopy(s) for s in subjects]
        t = time.time()
        out, _ = pred.predict(model, subs, label_attributes={})
        if not device_post:  # host chain on the fetched ids
            for s in out:
                # attached y_pred is one-hot (prediction.py contract):
                # collapse to ids as hippo_inference's CustomArgMax does
                ids = np.argmax(np.asarray(s["y_pred"].data), axis=0)
                ids = ids.astype(np.int16)
                ids, _ = remove_holes(ids, hole_size=64)
                ids, _, _ = keep_components(ids, 1)
        dt = time.time() - t
        if sweep > 0:
            times.append(dt)
        label = "device" if device_post else "host"
        print(f"postprocess={label} sweep {sweep}: {dt:.2f}s "
              f"({dt / len(subjects):.2f}s/volume)", flush=True)
    return sum(times) / len(times)


def main():
    shape = tuple(int(v) for v in
                  os.environ.get("SHAPE", "240,240,176").split(","))
    n_subjects = int(os.environ.get("SUBJECTS", "3"))
    sweeps = int(os.environ.get("SWEEPS", "3"))
    mode = os.environ.get("MODE")

    if os.environ.get("MODEL", "threshold") == "unet":
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
    else:
        model = threshold_model
    subjects = make_subjects(n_subjects, shape)

    results = {}
    for device_post in ([mode == "device"] if mode else [False, True]):
        mean = run(subjects, model, device_post, sweeps)
        key = "device" if device_post else "host"
        results[key] = round(mean / n_subjects, 3)
        print(f"RESULT postprocess={key}: {mean:.2f}s/sweep, "
              f"{mean / n_subjects:.2f}s/volume over {sweeps} warm sweeps",
              flush=True)
    print(json.dumps({"metric": "PatchPredict 240^3 sweep + "
                                "remove_holes(64)+keep_components(1)",
                      "unit": "s/volume", **results}))


if __name__ == "__main__":
    main()
