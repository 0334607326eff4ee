"""Training-outcome equivalence: hybrid combined mode vs host combined mode.

The hybrid fast path (training/hybrid_augment.py) claims the ablation
experiment's combined mode (ref configs/augmentation.py:49-50) trains with
the SAME semantics as the reference host path. Per-op exactness is
tested (tests/test_hybrid_augment.py); this experiment checks the claim at
the level that matters — the training OUTCOME: two runs on the same
synthetic dmri-like dataset, identical seeds and budgets, one with
device_cache+hybrid and one on the plain host path, compared on final
validation Dice. Different RNG streams (host numpy vs device PRNG) make
parity distributional, not bitwise: both runs must converge to the same
Dice band.

    PYTHONPATH=/root/repo python benchmarks/hybrid_equivalence.py
    ITERS=200 FILTERS=8 python benchmarks/hybrid_equivalence.py

Prints one JSON line {"host_dice", "hybrid_dice", "gap"}.
"""
import json
import os
import tempfile
from pathlib import Path

import numpy as np


def build_dataset(root: Path, n=10, shape=(24, 24, 16), n_grad=16):
    """Synthetic task where the mean-DWI channel CARRIES the label signal:
    if the hybrid resynthesis corrupted that channel's distribution, Dice
    would move."""
    import segmentation_pipeline_tpu as sp

    rng = np.random.default_rng(0)
    for i in range(n):
        d = root / "subjects" / f"s{i:02d}"
        d.mkdir(parents=True)
        W, H, D = shape
        seg = np.zeros((1, W, H, D), np.int16)
        cx, cy, cz = rng.integers(8, W - 8), rng.integers(8, H - 8), \
            rng.integers(5, D - 5)
        seg[:, cx - 5:cx + 5, cy - 5:cy + 5, cz - 3:cz + 3] = 1
        # per-direction DWI: lesion raises signal; LOW contrast + heavy
        # per-direction noise so the task does not saturate (a saturated
        # Dice 1.0 on both sides discriminates nothing) — the signal is
        # only recoverable by averaging directions, i.e. through mean_dwi
        contrast = float(os.environ.get("CONTRAST", "0.55"))
        full = rng.normal(scale=1.0, size=(n_grad, W, H, D)).astype(np.float32)
        full += contrast * seg.astype(np.float32)
        md = rng.normal(scale=0.6, size=(1, W, H, D)).astype(np.float32) \
            + 0.15 * seg
        sp.write_nifti(d / "full_dwi.nii.gz", full, np.eye(4))
        sp.write_nifti(d / "mean_dwi.nii.gz", full.mean(0, keepdims=True),
                       np.eye(4))
        sp.write_nifti(d / "md.nii.gz", md, np.eye(4))
        sp.write_nifti(d / "seg.nii.gz", seg, np.eye(4))
        grad = np.concatenate([rng.normal(size=(n_grad, 3)),
                               np.full((n_grad, 1), 400.0)], 1)
        np.savetxt(d / "full_dwi_grad.b", grad)
        (d / "attributes.json").write_text(json.dumps({"fold": i % 3}))


def build_context(root, fast: bool, with_dwi: bool = True):
    import segmentation_pipeline_tpu as sp

    loader = sp.ComposeLoaders([
        sp.ImageLoader(glob_pattern="full_dwi.*", image_name="full_dwi",
                       image_constructor=sp.ScalarImage),
        sp.TensorLoader(glob_pattern="full_dwi_grad.b", tensor_name="grad",
                        belongs_to="full_dwi"),
        sp.ImageLoader(glob_pattern="mean_dwi.*", image_name="mean_dwi",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="md.*", image_name="md",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="seg.*", image_name="seg",
                       image_constructor=sp.LabelMap,
                       label_values={"fg": 1}),
        sp.AttributeLoader(glob_pattern="attributes.*"),
    ])
    dwi = sp.ReconstructMeanDWI(num_dwis=(1, 7), num_directions=(1, 3),
                                directionality=(4, 10))
    noise = sp.RandomNoise(std=0.035, p=0.3)
    blur = sp.RandomBlur((0, 1), p=0.2)
    standard = sp.Compose([
        sp.RandomFlip(axes=(0, 1, 2)),
        sp.RandomBiasField(p=0.5),
        sp.RescaleIntensity((0, 1), (0.01, 99.9)),
        sp.RandomGamma(p=0.8),
        sp.RescaleIntensity((-1, 1)),
        sp.OneOf([sp.Compose([blur, noise]), sp.Compose([noise, blur])]),
    ], exclude=["full_dwi"])
    model_io = sp.Compose([
        sp.RescaleIntensity((-1.0, 1.0), (0.5, 99.5)),
        sp.ConcatenateImages(image_names=["mean_dwi", "md"],
                             image_channels=[1, 1], new_image_name="X"),
        sp.RenameProperty(old_name="seg", new_name="y"),
        sp.CustomOneHot(include=["y"]),
    ])
    middle = sp.Compose([dwi, standard]) if with_dwi else standard
    transforms = {
        "default": model_io,
        "training": sp.Compose([middle, model_io]),
    }
    ctx = sp.Context(name=f"hyb-eq-{'fast' if fast else 'host'}",
                     variables={"P": str(root)})
    ctx.add_component("dataset", sp.SubjectFolder, root="$P",
                      subject_path="subjects", subject_loader=loader,
                      cohorts={"training": sp.ForbidAttributes({"fold": 0}),
                               "validation":
                                   sp.RequireAttributes({"fold": 0})},
                      transforms=transforms)
    ctx.add_component("model", sp.NestedResUNet, input_channels=2,
                      output_channels=2,
                      filters=int(os.environ.get("FILTERS", "8")))
    ctx.add_component("optimizer", sp.Adam, lr=3e-3)
    ctx.add_component("criterion", sp.HybridLogisticDiceLoss)
    ctx.add_component(
        "trainer", sp.SegmentationTrainer, training_batch_size=4,
        save_rate=10 ** 6, scoring_interval=10 ** 6, scoring_function=None,
        one_time_evaluators=[], training_evaluators=[],
        validation_evaluators=[sp.ScheduledEvaluation(
            evaluator=sp.SegmentationEvaluator("y_pred_eval", "y_eval"),
            log_name="seg", cohorts=["validation"],
            interval=int(os.environ.get("ITERS", "200")) - 1)],
        max_iterations_with_no_improvement=10 ** 9,
        train_predictor=sp.StandardPredict(image_names=["X", "y"]),
        validation_predictor=sp.StandardPredict(image_names=["X"]),
        train_dataloader_factory=sp.StandardDataLoader(
            sampler=sp.RandomSampler),
        validation_dataloader_factory=sp.StandardDataLoader(
            sampler=sp.SequentialSampler),
        device_cache=fast, device_augmentation="auto" if fast else None)
    ctx.init_components()
    return ctx


class _Cap:
    def __init__(self):
        self.records = []

    def setup(self, c):
        pass

    def save_context(self, *a):
        pass

    def log(self, d):
        self.records.append(d)


def final_dice(records):
    for r in reversed(records):
        if "seg" in r:
            stats = r["seg"]["validation"]["summary_stats"]
            return float(stats["mean", "fg", "dice"])
    raise RuntimeError("no validation sweep recorded")


def run(fast: bool, root: Path, seed: int, with_dwi: bool = True):
    import segmentation_pipeline_tpu as sp

    sp.seed_all(seed)
    ctx = build_context(root, fast, with_dwi=with_dwi)
    cap = _Cap()
    ctx.trainer.train(ctx, max_iterations=int(os.environ.get("ITERS", "200")),
                      logger=cap)
    return final_dice(cap.records)


def main():
    iters = int(os.environ.get("ITERS", "200"))
    seeds = [int(v) for v in
             os.environ.get("SEEDS", "1234,77,2024").split(",")]
    with_dwi = os.environ.get("WITH_DWI", "1") == "1"
    tmp = Path(tempfile.mkdtemp(prefix="hybrid_eq_"))
    try:
        a = tmp / "host"
        b = tmp / "hybrid"
        build_dataset(a)
        build_dataset(b)
        host = [run(False, a, s, with_dwi) for s in seeds]
        fast = [run(True, b, s, with_dwi) for s in seeds]
        hm, fm = float(np.mean(host)), float(np.mean(fast))
        print(json.dumps({
            "metric": ("hybrid combined-mode" if with_dwi else
                       "device-aug standard-mode (control)")
                      + f" training equivalence (final val dice, "
                        f"{iters} iters x {len(seeds)} seeds)",
            "host_dice_mean": round(hm, 4),
            "fast_dice_mean": round(fm, 4),
            "host_dice_runs": [round(v, 4) for v in host],
            "fast_dice_runs": [round(v, 4) for v in fast],
            "gap": round(abs(hm - fm), 4),
        }))
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
