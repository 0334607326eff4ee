"""Packaged ship-to-clinician hippocampus inference with orientation TTA.

Counterpart of ref run_inference.py:35-232 (which documents the intended
behavior but has stale imports): load checkpoint(s), strip TargetResample
from the preprocessing pipeline, per subject run test-time augmentation over
all 48 orientations (6 permutations x 8 flips), invert each prediction back,
majority-vote voxelwise, remove holes, resample to the original grid, save.

    python run_inference.py <checkpoint_or_dir> <dataset> out.nii.gz \
        [--patch] [--orientation-count 48]
"""
import argparse
import itertools
from pathlib import Path

import numpy as np

from segmentation_pipeline_tpu import (
    Compose,
    Context,
    EnsembleModels,
    Flip,
    PatchPredict,
    PermuteDimensions,
    StandardPredict,
    Subject,
    TargetResample,
    filter_transform,
    list_checkpoint_files,
)
from segmentation_pipeline_tpu.post_processing import remove_holes
from segmentation_pipeline_tpu.transforms.base import invert_records
from segmentation_pipeline_tpu.transforms.spatial import resample_array


def get_test_time_transforms():
    """All 48 orientation transforms: 6 spatial permutations x 8 flip
    combinations (ref run_inference.py:35-48)."""
    transforms = []
    for permutation in itertools.permutations((0, 1, 2)):
        for order in range(4):
            for flip_axes in itertools.combinations((0, 1, 2), order):
                ops = [PermuteDimensions(permutation)]
                if flip_axes:
                    ops.append(Flip(flip_axes))
                transforms.append(Compose(ops))
    return transforms


def test_time_augmentation(subject, predictor, model, orientation_count=48):
    """Predict under each orientation, invert back, voxelwise mode vote
    (ref run_inference.py:66-88)."""
    import copy

    predictions = []
    for tta_transform in get_test_time_transforms()[:orientation_count]:
        aug_subject = copy.deepcopy(subject)
        aug_subject = tta_transform(aug_subject)

        [aug_subject], _ = predictor.predict(model, [aug_subject])

        # invert the C-channel prediction FIRST: pipelines ending in
        # CustomOneHot(include=['y']) record an inverse CustomArgMax that
        # performs the argmax during inversion — argmaxing before it would
        # leave a single-channel map whose second argmax zeroes everything
        pred_subject = Subject({"y": copy.deepcopy(aug_subject["y_pred"])})
        pred_subject = invert_records(pred_subject, aug_subject.get_composed_history(),
                                      warn=False)
        pred = np.asarray(pred_subject.get_first_image().data)
        if pred.shape[0] > 1:  # no OneHot in the history: argmax here
            pred = np.argmax(pred, axis=0)[None]
        predictions.append(pred.astype(np.int32))

    stacked = np.stack(predictions)  # (T, 1, W, H, D)
    flat = stacked.reshape(stacked.shape[0], -1)
    n_classes = int(flat.max()) + 1
    counts = np.stack([(flat == c).sum(axis=0) for c in range(n_classes)])
    mode = np.argmax(counts, axis=0).reshape(stacked.shape[1:])
    return mode.astype(np.int32)


def main():
    parser = argparse.ArgumentParser(description="Auto Hippocampus Segmentation")
    parser.add_argument("checkpoint_path", help="Checkpoint file or folder of checkpoints")
    parser.add_argument("dataset_path")
    parser.add_argument("output_filename")
    parser.add_argument("--out-folder", default="")
    parser.add_argument("--patch", action="store_true",
                        help="Use sliding-window patch inference")
    parser.add_argument("--patch-size", type=int, default=96)
    parser.add_argument("--patch-overlap", type=int, default=48)
    parser.add_argument("--orientation-count", type=int, default=48)
    parser.add_argument("--cohort", default=None)
    parser.add_argument("--device-argmax", action="store_true",
                        help="argmax on device; fetch uint8 ids per "
                             "orientation instead of float32 probabilities "
                             "(identical vote, much less host transfer)")
    args = parser.parse_args()

    checkpoint_path = Path(args.checkpoint_path)
    files = list_checkpoint_files(checkpoint_path)

    contexts = []
    for i, file_path in enumerate(files):
        context = Context(file_path=str(file_path),
                          variables=dict(DATASET_PATH=args.dataset_path))
        # only the first context's dataset is used: skip N-1 full ingestions
        context.keep_components(("model", "dataset") if i == 0 else ("model",))
        context.init_components()
        contexts.append(context)
    context = contexts[0]
    if len(contexts) > 1:
        context.model = EnsembleModels([c.model for c in contexts], strategy="mean")

    dataset = (context.dataset if args.cohort is None
               else context.dataset.get_cohort_dataset(args.cohort))

    # strip TargetResample: inference runs in the subject's native spacing
    # (ref run_inference.py:165)
    if dataset.transform is not None:
        dataset.transform = filter_transform(dataset.transform,
                                             exclude_types=[TargetResample])

    if args.patch:
        predictor = PatchPredict(patch_batch_size=1, patch_size=args.patch_size,
                                 patch_overlap=args.patch_overlap,
                                 overlap_mode="average", image_names=["X"],
                                 device_argmax=args.device_argmax)
    else:
        predictor = StandardPredict(image_names=["X"],
                                    device_argmax=args.device_argmax)

    for i in range(len(dataset)):
        subject = dataset[i]
        original = dataset.subjects[i]
        print(f"Running TTA inference for subject {subject['name']}")

        label_data = test_time_augmentation(subject, predictor, context.model,
                                            args.orientation_count)

        label_data, holes = remove_holes(label_data[0], hole_size=64)
        print(f"Filled {holes} voxels from detected holes.")
        label_data = label_data[None]

        # resample back onto the original subject grid if shapes mismatch
        # (ref run_inference.py:222-227)
        target_image = original.get_first_image()
        target_image.load()
        pred_affine = subject.get_first_image().affine
        if tuple(label_data.shape[1:]) != tuple(target_image.spatial_shape):
            label_data = resample_array(label_data.astype(np.float32), pred_affine,
                                        target_image.affine,
                                        target_image.spatial_shape, order=0)
            label_data = np.rint(label_data).astype(np.int32)

        out_folder = (Path(original["folder"]) if args.out_folder == ""
                      else Path(args.out_folder) / subject["name"])
        out_folder.mkdir(exist_ok=True, parents=True)
        from segmentation_pipeline_tpu import write_nifti

        write_nifti(out_folder / args.output_filename, label_data,
                    target_image.affine)


if __name__ == "__main__":
    main()
