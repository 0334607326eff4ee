"""MSSEG2 challenge inference: checkpoint(s) -> new-lesion mask in original space.

Counterpart of ref research/msseg2/competition/ms-inference.py:13-90:
patch-based inference (96^3, overlap 48, edge padding), full inverse back
through the history, hole removal (64) + small-component removal (3),
resample onto the original image grid, save NIfTI.

    python -m research.msseg2.competition.ms_inference <ensemble> <dataset> out.nii.gz
"""
import argparse
from pathlib import Path

import numpy as np

from segmentation_pipeline_tpu import (
    Context,
    EnsembleFlips,
    EnsembleModels,
    EnsembleOrientations,
    PatchPredict,
    Subject,
    list_checkpoint_files,
)
from segmentation_pipeline_tpu.post_processing import remove_holes, remove_small_components
from segmentation_pipeline_tpu.transforms.base import invert_records

# the competition's cleanup chain (ref ms-inference.py:47-51)
CLEANUP_CHAIN = [("remove_holes", 64), ("remove_small_components", 3)]


def _fused_cleanup_is_exact(subject) -> bool:
    """The fused device cleanup runs in MODEL space (before the history
    inversion); the reference cleans AFTER inversion (ref
    ms-inference.py:47-51). The two orders are voxel-identical iff every
    record's applied inverse commutes with the cleanup chain on y_pred:

    - non-invertible records: invert_records skips them entirely;
    - intensity transforms: their inverses select intensity images only
      (``get_images_dict(intensity_only=True)``) and y_pred is a LabelMap;
    - ConcatenateImages / RenameProperty: the inverse moves/renames whole
      images without touching voxels;
    - CustomOneHot: with device_argmax the attached y_pred is exactly
      one-hot, so the inverse argmax is the identity relabeling on the
      ids the cleanup saw.

    Everything geometric stays on the host path: crops do NOT commute
    because remove_holes fills small border-touching background regions
    that reconnect to background once the inverse pads the volume back,
    pads invert to crops that can split/shrink components across the cut,
    and resamples change voxel counts outright. (So the full competition
    pipeline — TargetResample/CropToMask/MinSizePad — deliberately takes
    the host path; the fused path serves datasets already in model
    geometry.)"""
    from segmentation_pipeline_tpu.transforms import (
        ConcatenateImages as _Concat,
        CustomOneHot as _OneHot,
        RenameProperty as _Rename,
    )
    from segmentation_pipeline_tpu.transforms.base import IntensityTransform

    safe_classes = (_Concat, _Rename, _OneHot, IntensityTransform)
    for rec in subject.get_composed_history():
        t = rec.transform
        if not t.is_invertible():
            continue
        if isinstance(t, safe_classes):
            continue
        return False
    return True


def inference(dataset, model, out_folder, output_filename,
              device_argmax=False, device_postprocess=False):
    predictor = PatchPredict(patch_batch_size=1, patch_size=96, patch_overlap=48,
                             padding_mode="edge", overlap_mode="average",
                             image_names=["X"], device_argmax=device_argmax)
    fused_predictor = PatchPredict(
        patch_batch_size=1, patch_size=96, patch_overlap=48,
        padding_mode="edge", overlap_mode="average", image_names=["X"],
        device_argmax=True, device_postprocess=CLEANUP_CHAIN)

    for i in range(len(dataset)):
        subject = dataset[i]
        untransformed_subject = dataset.subjects[i]
        print(f"Running model for subject {subject['name']}")

        folder = Path(subject["folder"]) if out_folder == "" else \
            Path(out_folder) / subject["name"]
        folder.mkdir(exist_ok=True, parents=True)

        # fused path: cleanup happens on device before the bit-packed ids
        # fetch (only the CLEANED mask crosses the link) — used only when
        # provably identical to the reference's clean-after-inversion order
        fused = device_postprocess and _fused_cleanup_is_exact(subject)
        if device_postprocess and not fused:
            print("device-postprocess: history has a spatial/label inverse; "
                  "falling back to the host cleanup for exact parity")

        [subject], _ = (fused_predictor if fused else predictor).predict(
            model, [subject])

        records = subject.get_composed_history()
        pred_subject = Subject({"y": subject["y_pred"]})
        pred_subject = invert_records(pred_subject, records, warn=False)
        output_label = pred_subject.get_first_image()

        label_data = np.argmax(np.asarray(output_label.data), axis=0) \
            if output_label.data.shape[0] > 1 else np.asarray(output_label.data)[0]
        label_data = label_data.astype(np.int32)

        if fused:
            print("Cleanup ran fused on device (holes filled + small "
                  "components removed before the ids fetch).")
        else:
            # the host chain derives from the SAME constant the fused
            # predictor uses — fused-eligible and fallback subjects in one
            # run must never be cleaned with different parameters
            for op, arg in CLEANUP_CHAIN:
                if op == "remove_holes":
                    label_data, removed = remove_holes(label_data, hole_size=arg)
                    print(f"Filled {removed} voxels from detected holes.")
                elif op == "remove_small_components":
                    label_data, removed = remove_small_components(label_data, arg)
                    print(f"Removed {removed} voxels from small predictions "
                          f"less than size {arg}.")
                else:  # pragma: no cover — CLEANUP_CHAIN is a module constant
                    raise ValueError(f"unknown cleanup op {op!r}")

        output_label.set_data(label_data[None].astype(np.int32))

        # resample back onto the original image grid (nearest-neighbor)
        from segmentation_pipeline_tpu.transforms.spatial import resample_array

        target_image = untransformed_subject.get_first_image()
        target_image.load()

        data = resample_array(np.asarray(output_label.data).astype(np.float32),
                              output_label.affine, target_image.affine,
                              target_image.spatial_shape, order=0)
        output_label.set_data(np.rint(data).astype(np.int32))
        output_label.affine = target_image.affine.copy()

        if output_label.spatial_shape != target_image.spatial_shape:
            raise RuntimeError("Segmentation shape and original image shape do not match.")

        output_label.save(folder / output_filename)


def main():
    parser = argparse.ArgumentParser(description="MSSEG2 new-lesion segmentation")
    parser.add_argument("ensemble_path")
    parser.add_argument("dataset_path")
    parser.add_argument("output_filename")
    parser.add_argument("--out-folder", default="")
    parser.add_argument("--ensemble-orientations", default="",
                        choices=["", "flips", "orientations"])
    parser.add_argument("--ensemble-folds", action="store_true")
    parser.add_argument("--cohort", default=None)
    parser.add_argument("--device-argmax", action="store_true",
                        help="argmax on device and fetch uint8 label ids "
                             "instead of the float32 probability volume "
                             "(identical mask, much less host transfer)")
    parser.add_argument("--device-postprocess", action="store_true",
                        help="run the hole-fill + small-component cleanup "
                             "fused on device before the ids fetch "
                             "(implies --device-argmax; falls back to the "
                             "host cleanup per subject when the transform "
                             "history makes the fused order inexact)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 forward (f32 weights): +12-20%% on "
                             "v5e; omit for exact reference numerics")
    args = parser.parse_args()

    contexts = []
    for i, file_path in enumerate(list_checkpoint_files(Path(args.ensemble_path))):
        context = Context(file_path=file_path,
                          variables=dict(DATASET_PATH=args.dataset_path))
        # under --ensemble-folds only contexts[0].dataset is used; per-fold
        # evaluation without it still needs each dataset, so keep the first
        # always and the rest only when folds are NOT ensembled
        keep = ("model", "dataset") if (i == 0 or not args.ensemble_folds) \
            else ("model",)
        context.keep_components(keep)
        context.init_components()
        if args.bf16 and getattr(context.model, "compute_dtype",
                                 "absent") is None:
            context.model.compute_dtype = "bfloat16"
        if args.ensemble_orientations == "orientations":
            context.model = EnsembleOrientations(context.model, strategy="majority")
        if args.ensemble_orientations == "flips":
            context.model = EnsembleFlips(context.model, strategy="majority")
        contexts.append(context)
    print("Loaded models.")

    if args.ensemble_folds:
        context = contexts[0]
        context.model = EnsembleModels([c.model for c in contexts], strategy="majority")
        contexts = [context]

    for i, context in enumerate(contexts):
        dataset = (context.dataset if args.cohort is None
                   else context.dataset.get_cohort_dataset(args.cohort))
        print(f"Running evaluation for context {i}")
        inference(dataset, context.model, args.out_folder, args.output_filename,
                  # --device-postprocess implies --device-argmax: even the
                  # host-fallback subjects should then fetch uint8 ids, not
                  # the float32 probability volume
                  device_argmax=args.device_argmax or args.device_postprocess,
                  device_postprocess=args.device_postprocess)


if __name__ == "__main__":
    main()
