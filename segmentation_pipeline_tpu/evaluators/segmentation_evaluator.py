"""Voxel-overlap segmentation metrics.

Behavioral parity with ref evaluators/segmentation_evaluator.py:7-102:
per (subject, named label) TP/FP/TN/FN and dice/jaccard/precision/recall,
plus summary stats.  Counts are computed as vectorized numpy reductions over
all labels at once (the device-side batched variant lives in the trainer's
hot path later; offline evaluation is host-side like the reference).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from .evaluator import Evaluator
from .labeled_tensor import LabeledTensor

STATS = ("target_volume", "prediction_volume", "TP", "FP", "TN", "FN",
         "dice", "jaccard", "precision", "recall")


def confusion_stats(pred: np.ndarray, target: np.ndarray, label_values: dict) -> dict:
    """pred/target: (C, W, H, D) integer label maps. Returns
    {stat: {label_name: value}} with float64 math (0/0 -> nan, x/0 -> inf,
    matching torch's float division used by the reference)."""
    out = {stat: {} for stat in STATS}
    n_vox = pred.size
    with np.errstate(divide="ignore", invalid="ignore"):
        for label_name, label_value in label_values.items():
            p = pred == label_value
            t = target == label_value
            tp = float(np.logical_and(t, p).sum())
            fp = float(np.logical_and(~t, p).sum())
            fn = float(np.logical_and(t, ~p).sum())
            tn = float(n_vox - tp - fp - fn)
            out["target_volume"][label_name] = tp + fn
            out["prediction_volume"][label_name] = tp + fp
            out["TP"][label_name] = tp
            out["FP"][label_name] = fp
            out["TN"][label_name] = tn
            out["FN"][label_name] = fn
            out["dice"][label_name] = _div(2 * tp, 2 * tp + fp + fn)
            out["jaccard"][label_name] = _div(tp, tp + fp + fn)
            out["precision"][label_name] = _div(tp, tp + fp)
            out["recall"][label_name] = _div(tp, tp + fn)
    return out


def _div(a: float, b: float) -> float:
    if b == 0:
        return float("nan") if a == 0 else float("inf")
    return a / b


class SegmentationEvaluator(Evaluator):
    """Evaluates prediction vs target label maps named in each subject; both
    must share an identical 'label_values' dict (ref docstring semantics)."""

    def __init__(self, prediction_label_map_name: str, target_label_map_name: str,
                 stats_to_output: Sequence[str] = ("target_volume", "prediction_volume",
                                                   "TP", "FP", "TN", "FN",
                                                   "dice", "precision", "recall"),
                 summary_stats_to_output: Sequence[str] = ("mean", "std", "min", "max")):
        self.prediction_label_map_name = prediction_label_map_name
        self.target_label_map_name = target_label_map_name
        self.stats_to_output = stats_to_output
        self.summary_stats_to_output = summary_stats_to_output

    def __call__(self, subjects):
        label_values = subjects[0][self.prediction_label_map_name]["label_values"]
        label_names = list(label_values.keys())
        subject_names = [s["name"] for s in subjects]

        subject_stats = LabeledTensor(
            dim_names=["subject", "label", "stat"],
            dim_keys=[subject_names, label_names, list(self.stats_to_output)])

        for subject in subjects:
            pred = np.asarray(subject[self.prediction_label_map_name].data)
            target = np.asarray(subject[self.target_label_map_name].data)
            stats = confusion_stats(pred, target, label_values)
            for label_name in label_names:
                for stat_name in self.stats_to_output:
                    subject_stats[subject["name"], label_name, stat_name] = \
                        stats[stat_name][label_name]

        summary_stats = subject_stats.compute_summary_stats(self.summary_stats_to_output)
        return {
            "subject_stats": subject_stats.to_dataframe(),
            "summary_stats": summary_stats,
        }
