"""Host-side transform benchmark (CPU): per-transform wall at msseg2 volume
scale (3ch 160x192x160 f32 + 1ch label).

The host pipeline runs in loader workers (or once, under
pretransform_training_data); on TPU rigs the stochastic ops usually move to
the fused device pipeline (ops/augment.py), but preprocessing and any
host-augmentation deployment still pay these costs.

Prints one JSON line per transform. Run: python benchmarks/bench_host_transforms.py
"""
import json
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from segmentation_pipeline_tpu.core.subject import (  # noqa: E402
    LabelMap, ScalarImage, Subject)
from segmentation_pipeline_tpu.transforms import (  # noqa: E402
    CropOrPad, RandomAffine, RandomBiasField, RandomBlur,
    RandomElasticDeformation, RandomGamma, RandomNoise, Resample,
    RescaleIntensity, ZNormalization)

SHAPE = (3, 160, 192, 160)


def make_subject(rng):
    s = Subject(name="bench", folder="/tmp")
    s["X"] = ScalarImage(tensor=rng.normal(size=SHAPE).astype(np.float32),
                         affine=np.eye(4))
    s["y"] = LabelMap(tensor=(rng.random(SHAPE[1:]) > 0.9
                              ).astype(np.int16)[None],
                      affine=np.eye(4), label_values={"fg": 1})
    return s


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("RescaleIntensity(0.5-99.5)", RescaleIntensity((-1, 1), (0.5, 99.5))),
        ("ZNormalization", ZNormalization()),
        ("CropOrPad(96^3)", CropOrPad((96, 96, 96))),
        ("RandomNoise", RandomNoise()),
        ("RandomBlur", RandomBlur()),
        ("RandomGamma", RandomGamma()),
        ("RandomBiasField", RandomBiasField()),
        ("RandomAffine(s0.2,d45)", RandomAffine(scales=0.2, degrees=45)),
        ("RandomElasticDeformation", RandomElasticDeformation()),
        ("Resample(2mm)", Resample(target=(2.0, 2.0, 2.0))),
    ]
    for name, t in cases:
        times = []
        for _ in range(3):
            s = make_subject(rng)
            t0 = time.time()
            t(s)
            times.append(time.time() - t0)
        print(json.dumps({"transform": name,
                          "ms": round(min(times) * 1e3, 1)}))


if __name__ == "__main__":
    main()
