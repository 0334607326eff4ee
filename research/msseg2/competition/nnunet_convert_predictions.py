"""Stage nnUNet MSSEG2 cross-validation outputs next to this pipeline's
predictions for side-by-side evaluation.

Counterpart of ref research/msseg2/competition/nnunet_convert_predictions.py:
for each prediction folder produced by ms_inference, copy the matching
nnUNet raw and post-processed cross-validation NIfTIs in as
``nnunet_raw.nii.gz`` / ``nnunet_postprocessed.nii.gz`` so the
ms-evaluation notebook scores all three stacks on identical subjects.

    python -m research.msseg2.competition.nnunet_convert_predictions \
        <nnunet_task_dir> <predictions_dir>

where <nnunet_task_dir> contains ``cv_niftis_raw/`` and
``cv_niftis_postprocessed/``.
"""
import argparse
import shutil
from pathlib import Path


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("nnunet_task_dir",
                        help="nnUNet trained-model task folder (contains "
                             "cv_niftis_raw/ and cv_niftis_postprocessed/)")
    parser.add_argument("predictions_dir",
                        help="per-subject prediction folders from ms_inference")
    args = parser.parse_args()

    task_dir = Path(args.nnunet_task_dir)
    raw_files = sorted(p for p in (task_dir / "cv_niftis_raw").iterdir()
                       if p.name.endswith("nii.gz"))
    post_files = sorted(p for p in (task_dir / "cv_niftis_postprocessed").iterdir()
                        if p.name.endswith("nii.gz"))
    pred_folders = sorted(p for p in Path(args.predictions_dir).iterdir()
                          if p.is_dir())
    if not (len(raw_files) == len(post_files) == len(pred_folders)):
        raise SystemExit(
            f"count mismatch: {len(raw_files)} raw, {len(post_files)} "
            f"post-processed, {len(pred_folders)} prediction folders")

    for pred_folder, raw, post in zip(pred_folders, raw_files, post_files):
        shutil.copy(raw, pred_folder / "nnunet_raw.nii.gz")
        shutil.copy(post, pred_folder / "nnunet_postprocessed.nii.gz")
        print(f"{pred_folder.name}: {raw.name} -> nnunet_raw.nii.gz, "
              f"{post.name} -> nnunet_postprocessed.nii.gz")


if __name__ == "__main__":
    main()
