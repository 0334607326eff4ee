"""Re-import nnUNet ensemble predictions back into subject folders.

Counterpart of ref research/dmri_hippo/nn_unet/convert_predictions.py:16-60:
maps nnUNet's renamed outputs back to original subject names via
original_subject_names.json and copies them as <label_name>.nii.gz per
subject so evaluate.py can score them like any other run.

    python -m research.dmri_hippo.nn_unet.convert_predictions \
        <nnunet_predictions_dir> <names_json> <out_path> --label-name nnunet
"""
import argparse
import json
import shutil
from pathlib import Path


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("predictions_dir")
    parser.add_argument("names_json",
                        help="original_subject_names.json from the export")
    parser.add_argument("out_path")
    parser.add_argument("--label-name", default="nnunet")
    args = parser.parse_args()

    with open(args.names_json) as f:
        names = json.load(f)
    lookup = {v: k for k, v in names["cross_validation_subjects"].items()}
    lookup.update({v: k for k, v in names["test_subjects"].items()})

    out_path = Path(args.out_path)
    count = 0
    for path in sorted(Path(args.predictions_dir).iterdir()):
        if not path.name.endswith(".nii.gz"):
            continue
        nn_name = path.name[: -len(".nii.gz")]
        original = lookup.get(nn_name)
        if original is None:
            print(f"skipping {path.name}: no original-name mapping")
            continue
        subject_dir = out_path / "subjects" / original
        subject_dir.mkdir(parents=True, exist_ok=True)
        shutil.copy(path, subject_dir / f"{args.label_name}.nii.gz")
        count += 1

    with open(out_path / f"{args.label_name}.json", "w") as f:
        json.dump({"output_filename": f"{args.label_name}.nii.gz",
                   "source": str(args.predictions_dir)}, f, indent=4)
    print(f"converted {count} predictions")


if __name__ == "__main__":
    main()
