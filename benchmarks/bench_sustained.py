"""Sustained trainer-loop throughput at the dmri_hippo config.

Measures the REAL hot loop (ref segmentation_trainer.py:162-277): host
pipeline (deepcopy + transform + collate), compact H2D transfer, fused
train step, device augmentation, per-iteration metric fetch + JSONL
logging — everything except the interval-gated validation sweep, whose
cadence is config-dependent (set EVAL_INTERVAL to include it).

Prints one JSON line with volumes/sec plus the mean per-phase wall profile
(ms/iter) over the post-warmup iterations, so regressions are attributable.

Env knobs: ITERS (default 60), WARMUP (10), BATCH (4), COMPUTE_DTYPE
(e.g. bfloat16), EVAL_INTERVAL (0 = never), DEVICE_AUG (1 = on).
"""
import json
import os
import shutil
import tempfile
import time
from pathlib import Path

import numpy as np


class _TimedLogger:
    """NonLogger with wall stamps + timer capture per iteration."""

    def __init__(self):
        self.wall = []
        self.timers = []

    def setup(self, context):
        pass

    def save_context(self, context, folder, iteration):
        pass

    def log(self, log_dict):
        self.wall.append(time.time())
        self.timers.append(dict(log_dict.get("timer", {})))

    def close(self):
        pass


def _device_aug_config():
    """DEVICE_AUG=0 -> None; DEVICE_AUG=1 -> DEFAULT_CONFIG (the historical
    aug-light measurement); DEVICE_AUG=auto -> device_augmentation="auto":
    the bench declares the REFERENCE training pipeline (elastic p=0.5 /
    spatial OneOf, blur p=0.2, reference noise) and the trainer derives the
    fused device config from it (training/auto_augment.py) — the
    reference-strength rows in PARITY.md.  WARP_GATHER=bfloat16 taps the
    affine warp's image gathers from a bf16 source copy (PARITY.md
    "Source-dtype levers"; dict modes only)."""
    mode = os.environ.get("DEVICE_AUG", "1")
    if mode == "0":
        return None
    if mode in ("auto", "combined"):
        # "combined": the ablation experiment's combined mode (ref
        # configs/augmentation.py:41-50) — ReconstructMeanDWI + the standard
        # block; resolves through the HYBRID derivation (mean_dwi
        # regenerated on host per batch, spliced into the device cache)
        return "auto"
    cfg = {}
    gd = os.environ.get("WARP_GATHER")
    if gd:
        cfg["warp_gather_dtype"] = gd
    return cfg


def build(root: Path):
    import segmentation_pipeline_tpu as sp

    rng = np.random.default_rng(0)
    for i in range(8):
        d = root / "subjects" / f"sub-{i:02d}"
        d.mkdir(parents=True)
        shape = (96, 88, 24)
        img = rng.normal(scale=0.3, size=(1, *shape)).astype(np.float32)
        seg = np.zeros((1, *shape), np.int16)
        seg[:, 30:66, 30:60, 8:18] = 1
        img[seg.astype(bool)] += 2.0
        sp.write_nifti(d / "mean_dwi.nii.gz", img, np.eye(4))
        sp.write_nifti(d / "md.nii.gz", img * 0.5, np.eye(4))
        sp.write_nifti(d / "fa.nii.gz", img * 0.25, np.eye(4))
        sp.write_nifti(d / "whole_roi.nii.gz", seg, np.eye(4))
        if os.environ.get("DEVICE_AUG") == "combined":
            # 30-direction DWI series for the hybrid mean_dwi resynthesis
            # (realistic series size: ~24 MB/subject)
            full = np.repeat(img, 30, axis=0) + rng.normal(
                scale=0.1, size=(30, *shape)).astype(np.float32)
            sp.write_nifti(d / "full_dwi.nii.gz", full, np.eye(4))
            grad = np.concatenate([rng.normal(size=(30, 3)),
                                   np.full((30, 1), 400.0)], 1)
            np.savetxt(d / "full_dwi_grad.b", grad)
        with open(d / "attributes.json", "w") as f:
            json.dump({"fold": i % 4}, f)

    dwi_loaders = []
    if os.environ.get("DEVICE_AUG") == "combined":
        dwi_loaders = [
            sp.ImageLoader(glob_pattern="full_dwi.*", image_name="full_dwi",
                           image_constructor=sp.ScalarImage),
            sp.TensorLoader(glob_pattern="full_dwi_grad.b",
                            tensor_name="grad", belongs_to="full_dwi"),
        ]
    loader = sp.ComposeLoaders(dwi_loaders + [
        sp.ImageLoader(glob_pattern="mean_dwi.*", image_name="mean_dwi",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="md.*", image_name="md",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="fa.*", image_name="fa",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="whole_roi.*", image_name="whole_roi",
                       image_constructor=sp.LabelMap,
                       label_values={"hippo": 1}),
        sp.AttributeLoader(glob_pattern="attributes.*"),
    ])
    cohorts = {
        "training": sp.ForbidAttributes({"fold": 0}),
        "validation": sp.RequireAttributes({"fold": 0}),
    }
    # mirrors research/dmri_hippo/configs/main_config.py preprocessing
    model_io = sp.Compose([
        sp.RescaleIntensity((-1, 1), (0.5, 99.5)),
        sp.ConcatenateImages(image_names=["mean_dwi", "md", "fa"],
                             image_channels=[1, 1, 1], new_image_name="X"),
        sp.RenameProperty(old_name="whole_roi", new_name="y"),
        sp.CustomOneHot(include=["y"]),
    ])
    transforms = {"default": model_io}
    if os.environ.get("DEVICE_AUG") in ("auto", "combined"):
        # the REFERENCE augmentation block (ref main_config.py:86-100);
        # device_augmentation="auto" derives the fused device config from it
        noise = sp.RandomNoise(std=0.035, p=0.3)
        blur = sp.RandomBlur((0, 1), p=0.2)
        augmentation = sp.Compose([
            sp.RandomFlip(axes=(0, 1, 2)),
            sp.RandomElasticDeformation(p=0.5, num_control_points=(7, 7, 4),
                                        locked_borders=1,
                                        image_interpolation="bspline",
                                        exclude=["full_dwi"]),
            sp.RandomBiasField(p=0.5),
            sp.RescaleIntensity((0, 1), (0.01, 99.9)),
            sp.RandomGamma(p=0.8),
            sp.RescaleIntensity((-1, 1)),
            sp.OneOf([sp.Compose([blur, noise]), sp.Compose([noise, blur])]),
        ], exclude=["full_dwi"])
        if os.environ.get("DEVICE_AUG") == "combined":
            # the ablation's combined mode: dwi resynthesis ahead of the
            # standard block (ref configs/augmentation.py:49-50)
            augmentation = sp.Compose([
                sp.ReconstructMeanDWI(num_dwis=(1, 7), num_directions=(1, 3),
                                      directionality=(4, 10)),
                augmentation,
            ])
        transforms["training"] = sp.Compose([augmentation, model_io])

    eval_interval = int(os.environ.get("EVAL_INTERVAL", "0"))
    validation_evaluators = []
    if eval_interval:
        validation_evaluators = [sp.ScheduledEvaluation(
            evaluator=sp.SegmentationEvaluator("y_pred_eval", "y_eval"),
            log_name="segmentation_eval", cohorts=["validation"],
            interval=eval_interval)]

    context = sp.Context(name="bench-sustained",
                         variables={"DATASET_PATH": str(root)})
    context.add_component("dataset", sp.SubjectFolder, root="$DATASET_PATH",
                          subject_path="subjects", subject_loader=loader,
                          cohorts=cohorts, transforms=transforms)
    context.add_component("model", sp.NestedResUNet, input_channels=3,
                          output_channels=2,
                          # FILTERS: CPU smoke tests shrink the model
                          filters=int(os.environ.get("FILTERS", "40")),
                          dropout_p=0.2)
    context.add_component("optimizer", sp.Adam, lr=2e-4)
    context.add_component("criterion", sp.HybridLogisticDiceLoss)
    context.add_component(
        "trainer", sp.SegmentationTrainer,
        training_batch_size=int(os.environ.get("BATCH", "4")),
        save_rate=10 ** 9, scoring_interval=10 ** 9,
        scoring_function=lambda d: -d["loss"], one_time_evaluators=[],
        training_evaluators=[], validation_evaluators=validation_evaluators,
        max_iterations_with_no_improvement=10 ** 9,
        train_predictor=sp.StandardPredict(image_names=["X", "y"],
                                           sagittal_split=True),
        # device_argmax: the sweep ships bit-packed label ids instead of the
        # C-channel f32 probability volume (identical hard segmentations)
        validation_predictor=sp.StandardPredict(
            image_names=["X"],
            device_argmax=os.environ.get("VAL_ARGMAX", "1") == "1"),
        train_dataloader_factory=sp.StandardDataLoader(
            sampler=sp.RandomSampler),
        validation_dataloader_factory=sp.StandardDataLoader(
            sampler=sp.SequentialSampler),
        device_augmentation=_device_aug_config(),
        compute_dtype=os.environ.get("COMPUTE_DTYPE") or None,
        device_cache=os.environ.get("DEVICE_CACHE", "0") == "1",
        device_confusion=(
            False if os.environ.get("DEVICE_CONFUSION", "1") == "0" else None))
    return context


def build_msseg2(root: Path):
    """Patch-training workload: weighted 96^3 patches into the depth-6
    BlurConv ModularUNet (ref msseg2.py:84-93,148-153)."""
    import segmentation_pipeline_tpu as sp

    rng = np.random.default_rng(0)
    shape = tuple(int(x) for x in
                  os.environ.get("VOLUME_SHAPE", "160,192,160").split(","))
    for i in range(4):
        d = root / "subjects" / f"sub-{i:02d}"
        d.mkdir(parents=True)
        flair1 = rng.normal(scale=0.3, size=(1, *shape)).astype(np.float32)
        lesions = np.zeros((1, *shape), np.int16)
        for _ in range(12):
            c = [rng.integers(10, s - 10) for s in shape]
            lesions[0, c[0] - 3:c[0] + 3, c[1] - 3:c[1] + 3,
                    c[2] - 3:c[2] + 3] = 1
        flair2 = flair1 + lesions * 1.5
        sp.write_nifti(d / "flair_time01.nii.gz", flair1, np.eye(4))
        sp.write_nifti(d / "flair_time02.nii.gz", flair2, np.eye(4))
        sp.write_nifti(d / "ground_truth.nii.gz", lesions, np.eye(4))
        with open(d / "attributes.json", "w") as f:
            json.dump({"fold": i % 4}, f)

    loader = sp.ComposeLoaders([
        sp.ImageLoader(glob_pattern="flair_time01.*", image_name="t1",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="flair_time02.*", image_name="t2",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="ground_truth.*", image_name="gt",
                       image_constructor=sp.LabelMap,
                       label_values={"lesion": 1}),
        sp.AttributeLoader(glob_pattern="attributes.*"),
    ])
    cohorts = {"training": sp.RequireAttributes(["t1"]),
               "validation": sp.RequireAttributes({"fold": 0})}
    model_io = sp.Compose([
        sp.RescaleIntensity((-1, 1), (0.5, 99.5)),
        sp.ConcatenateImages(image_names=["t1", "t2"], image_channels=[1, 1],
                             new_image_name="X"),
        sp.RenameProperty(old_name="gt", new_name="y"),
        sp.ImageFromLabels(new_image_name="patch_probability",
                           label_weights=[("y", "lesion", 100)]),
        sp.CustomOneHot(include=["y"]),
    ])
    transforms = {"default": model_io}
    if os.environ.get("DEVICE_AUG") == "auto":
        # the REFERENCE msseg2 augmentation block (ref msseg2.py:44-57)
        augmentation = sp.Compose([
            sp.RandomPermuteDimensions(),
            sp.RandomFlip(axes=(0, 1, 2)),
            sp.OneOf({
                sp.RandomElasticDeformation(): 0.2,
                sp.RandomAffine(scales=0.2, degrees=45,
                                default_pad_value="otsu"): 0.8,
            }, p=0.75),
            sp.RandomBiasField(p=0.5),
            sp.RescaleIntensity((0, 1), (0.01, 99.9)),
            sp.RandomGamma(p=0.8),
            sp.RescaleIntensity((-1, 1)),
            sp.RandomBlur((0, 1), p=0.2),
            sp.RandomNoise(std=0.1, p=0.35),
        ])
        transforms["training"] = sp.Compose([augmentation, model_io])

    eval_interval = int(os.environ.get("EVAL_INTERVAL", "0"))
    validation_evaluators = []
    if eval_interval:
        # the msseg2 offline metric (ref notebooks/ms-evaluation.ipynb,
        # instance_segmentation_evaluator.py:75): lesion detection via the
        # overlap histogram — the device path reduces it on chip and
        # fetches (K+1)^2 counts instead of an ids volume
        validation_evaluators = [sp.ScheduledEvaluation(
            evaluator=sp.InstanceSegmentationEvaluator(
                "y_pred_eval", "y_eval"),
            log_name="instance_eval", cohorts=["validation"],
            interval=eval_interval)]

    context = sp.Context(name="bench-msseg2",
                         variables={"DATASET_PATH": str(root)})
    context.add_component("dataset", sp.SubjectFolder, root="$DATASET_PATH",
                          subject_path="subjects", subject_loader=loader,
                          cohorts=cohorts, transforms=transforms)
    context.add_component(
        "model", sp.ModularUNet, in_channels=2, out_channels=2,
        filters=[40, 40, 80, 80, 120, 120], depth=6,
        block_params={"residual": True},
        downsample_class=sp.BlurConv3d,
        downsample_params={"kernel_size": 3, "stride": 2, "padding": 1},
        upsample_class=sp.BlurConvTranspose3d,
        upsample_params={"kernel_size": 3, "stride": 2, "padding": 1,
                         "output_padding": 0},
        remat=True)
    context.add_component("optimizer", sp.SGD, lr=1e-3, momentum=0.95)
    context.add_component("criterion", sp.HybridLogisticDiceLoss,
                          logistic_class_weights=[1, 100])
    context.add_component(
        "trainer", sp.SegmentationTrainer,
        training_batch_size=int(os.environ.get("BATCH", "4")),
        save_rate=10 ** 9, scoring_interval=10 ** 9,
        scoring_function=lambda d: -d["loss"], one_time_evaluators=[],
        training_evaluators=[], validation_evaluators=validation_evaluators,
        max_iterations_with_no_improvement=10 ** 9,
        train_predictor=sp.StandardPredict(image_names=["X", "y"]),
        validation_predictor=sp.PatchPredict(patch_size=(96, 96, 96),
                                             patch_overlap=12),
        train_dataloader_factory=sp.PatchDataLoader(
            max_length=16, samples_per_volume=1,
            sampler=sp.WeightedSampler(patch_size=(96, 96, 96),
                                       probability_map="patch_probability")),
        validation_dataloader_factory=sp.StandardDataLoader(
            sampler=sp.SequentialSampler),
        device_augmentation=_device_aug_config(),
        compute_dtype=os.environ.get("COMPUTE_DTYPE") or None,
        device_cache=os.environ.get("DEVICE_CACHE", "0") == "1",
        device_confusion=(
            False if os.environ.get("DEVICE_CONFUSION", "1") == "0" else None))
    return context



def build_qsm(root: Path):
    """10-class deep-grey-matter workload (ref research/qsm_deep_grey_matter/
    qsm_deep_grey_matter.py:7-65): T1+QSM -> NestedResUNet(2->10, f=40) at a
    synthetic post-crop shape (120, 144, 96). The 10-class label path is
    where the uint8-ids/bitpack levers scale with class count (PARITY.md);
    the sweep (EVAL_INTERVAL) exercises the (L+1)^2 device confusion fetch
    at L=9."""
    import segmentation_pipeline_tpu as sp

    rng = np.random.default_rng(0)
    shape = tuple(int(x) for x in
                  os.environ.get("VOLUME_SHAPE", "120,144,96").split(","))
    n_sub = int(os.environ.get("SUBJECTS", "6"))
    for i in range(n_sub):
        d = root / "subjects" / f"sub-{i:02d}"
        d.mkdir(parents=True)
        t1 = rng.normal(scale=0.3, size=(1, *shape)).astype(np.float32)
        qsm = rng.normal(scale=0.3, size=(1, *shape)).astype(np.float32)
        seg = np.zeros((1, *shape), np.int16)
        # 9 foreground structures (the post remove/merge/sequential classes)
        for cls in range(1, 10):
            c = [rng.integers(16, s - 16) for s in shape]
            r = int(rng.integers(4, 9))
            seg[0, c[0] - r:c[0] + r, c[1] - r:c[1] + r, c[2] - r:c[2] + r] = cls
        t1[seg > 0] += 1.0
        qsm[seg > 0] += 0.5
        sp.write_nifti(d / "t1.nii.gz", t1, np.eye(4))
        sp.write_nifti(d / "qsm.nii.gz", qsm, np.eye(4))
        sp.write_nifti(d / "dgm.nii.gz", seg, np.eye(4))
        with open(d / "attributes.json", "w") as f:
            json.dump({"fold": i % 3}, f)

    label_values = {f"structure_{k}": k for k in range(1, 10)}
    loader = sp.ComposeLoaders([
        sp.ImageLoader(glob_pattern="t1.*", image_name="t1",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="qsm.*", image_name="qsm",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="dgm.*", image_name="dgm",
                       image_constructor=sp.LabelMap,
                       label_values=label_values),
        sp.AttributeLoader(glob_pattern="attributes.*"),
    ])
    cohorts = {"training": sp.ForbidAttributes({"fold": 0}),
               "validation": sp.RequireAttributes({"fold": 0})}
    transforms = {"default": sp.Compose([
        sp.RescaleIntensity((-1, 1), (0.1, 99.9)),
        sp.ConcatenateImages(image_names=["t1", "qsm"], image_channels=[1, 1],
                             new_image_name="X"),
        sp.CopyProperty(old_name="dgm", new_name="y"),
        sp.CustomOneHot(num_classes=10, include=["y"]),
    ])}

    eval_interval = int(os.environ.get("EVAL_INTERVAL", "0"))
    validation_evaluators = []
    if eval_interval:
        validation_evaluators = [sp.ScheduledEvaluation(
            evaluator=sp.SegmentationEvaluator("y_pred_eval", "y_eval"),
            log_name="segmentation_eval", cohorts=["validation"],
            interval=eval_interval)]

    context = sp.Context(name="bench-qsm",
                         variables={"DATASET_PATH": str(root)})
    context.add_component("dataset", sp.SubjectFolder, root="$DATASET_PATH",
                          subject_path="subjects", subject_loader=loader,
                          cohorts=cohorts, transforms=transforms)
    context.add_component("model", sp.NestedResUNet, input_channels=2,
                          output_channels=10,
                          filters=int(os.environ.get("FILTERS", "40")),
                          dropout_p=0.2,
                          # whole-volume (120,144,96) batch-4 training holds
                          # five full-res 40ch nodes alive in the backward
                          # pass; without block remat the step needs 72.7G
                          # HBM (measured OOM) vs the chip's 15.75G
                          remat=os.environ.get("REMAT", "1") == "1")
    context.add_component("optimizer", sp.Adam, lr=2e-4)
    context.add_component("criterion", sp.HybridLogisticDiceLoss)
    context.add_component(
        "trainer", sp.SegmentationTrainer,
        training_batch_size=int(os.environ.get("BATCH", "4")),
        save_rate=10 ** 9, scoring_interval=10 ** 9,
        scoring_function=lambda d: -d["loss"], one_time_evaluators=[],
        training_evaluators=[], validation_evaluators=validation_evaluators,
        max_iterations_with_no_improvement=10 ** 9,
        train_predictor=sp.StandardPredict(image_names=["X", "y"]),
        validation_predictor=sp.StandardPredict(
            image_names=["X"],
            device_argmax=os.environ.get("VAL_ARGMAX", "1") == "1"),
        train_dataloader_factory=sp.StandardDataLoader(
            sampler=sp.RandomSampler),
        validation_dataloader_factory=sp.StandardDataLoader(
            sampler=sp.SequentialSampler),
        device_augmentation=_device_aug_config(),
        compute_dtype=os.environ.get("COMPUTE_DTYPE") or None,
        device_cache=os.environ.get("DEVICE_CACHE", "0") == "1",
        device_confusion=(
            False if os.environ.get("DEVICE_CONFUSION", "1") == "0" else None))
    return context


def main():
    workload = os.environ.get("WORKLOAD", "dmri")
    iters = int(os.environ.get("ITERS", "60" if workload == "dmri" else "25"))
    warmup = int(os.environ.get("WARMUP", "10" if workload == "dmri" else "5"))
    batch = int(os.environ.get("BATCH", "4"))

    tmp = Path(tempfile.mkdtemp(prefix="bench_sustained_"))
    try:
        builders = {"dmri": build, "msseg2": build_msseg2, "qsm": build_qsm}
        context = builders[workload](tmp)
        context.init_components()
        logger = _TimedLogger()
        context.trainer.train(context, max_iterations=iters, logger=logger,
                              preload_training_data=True,
                              preload_validation_data=(
                                  os.environ.get("PRELOAD_VAL", "0") == "1"))

        wall = np.array(logger.wall)
        assert len(wall) == iters, len(wall)
        span = wall[-1] - wall[warmup - 1]
        n = iters - warmup
        vols_per_sec = n * batch / span

        phases = {}
        for t in logger.timers[warmup:]:
            for k, v in t.items():
                phases[k] = phases.get(k, 0.0) + v
        iter_ms = span / n * 1000
        profile = {k: round(v / n * 1000, 1) for k, v in
                   sorted(phases.items(), key=lambda kv: -kv[1])}
        profile["untimed_residual"] = round(
            iter_ms - sum(profile.values()), 1)

        names = {
            "dmri": ("dmri_hippo SUSTAINED trainer loop (host pipeline + "
                     "compact transfer + device aug + sagittal split + "
                     "per-iter logging)", "volumes/sec"),
            "msseg2": ("msseg2 SUSTAINED patch-training loop (weighted 96^3 "
                       "patch sampling + device aug + per-iter logging)",
                       "patches/sec"),
            "qsm": ("qsm deep-grey-matter SUSTAINED trainer loop (10-class "
                    "NestedResUNet, 120x144x96x2, device aug + per-iter "
                    "logging)", "volumes/sec"),
        }
        metric, unit = names[workload]
        print(json.dumps({
            "metric": metric,
            "value": round(vols_per_sec, 2),
            "unit": unit,
            "iter_ms": round(iter_ms, 1),
            "profile_ms": profile,
            "config": {"iters": iters, "warmup": warmup, "batch": batch,
                       "compute_dtype": os.environ.get("COMPUTE_DTYPE"),
                       "device_aug": os.environ.get("DEVICE_AUG", "1"),
                       "device_cache": os.environ.get("DEVICE_CACHE", "0"),
                       "eval_interval": os.environ.get("EVAL_INTERVAL", "0"),
                       "device_confusion": os.environ.get("DEVICE_CONFUSION", "1"),
                       "warp_gather": os.environ.get("WARP_GATHER")},
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
