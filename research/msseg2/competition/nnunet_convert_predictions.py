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

    def by_stem(folder):
        files = {}
        for p in folder.iterdir():
            if p.name.endswith("nii.gz"):
                files[p.name[:-len(".nii.gz")]] = p
        return files

    raw_files = by_stem(task_dir / "cv_niftis_raw")
    post_files = by_stem(task_dir / "cv_niftis_postprocessed")
    pred_folders = sorted(p for p in Path(args.predictions_dir).iterdir()
                          if p.is_dir())

    # pair by subject name, never by sort position: naming conventions
    # differ between nnUNet exports and this pipeline's prediction folders,
    # and a positional zip would silently stage the wrong subject's mask
    missing = [f.name for f in pred_folders
               if f.name not in raw_files or f.name not in post_files]
    if missing:
        raise SystemExit(
            f"no nnUNet cv file matches prediction folder(s) {missing}; "
            f"raw stems: {sorted(raw_files)[:5]}... — rename folders or "
            f"files so subject names match")

    for pred_folder in pred_folders:
        raw = raw_files[pred_folder.name]
        post = post_files[pred_folder.name]
        shutil.copy(raw, pred_folder / "nnunet_raw.nii.gz")
        shutil.copy(post, pred_folder / "nnunet_postprocessed.nii.gz")
        print(f"{pred_folder.name}: {raw.name} -> nnunet_raw.nii.gz, "
              f"{post.name} -> nnunet_postprocessed.nii.gz")


if __name__ == "__main__":
    main()
