"""Generate the dmri_hippo dataset splits (stratified test + 5 folds + ab300
validation), written as attribute JSONs.

Counterpart of ref research/dmri_hippo/make_dmri_hippo_splits.py:9-81.

    python -m research.dmri_hippo.make_dmri_hippo_splits <dataset_path>
"""
import argparse
import json
from pathlib import Path

from segmentation_pipeline_tpu import (
    ComposeFilters,
    ForbidAttributes,
    NegateFilter,
    RequireAttributes,
    StratifiedFilter,
)
from segmentation_pipeline_tpu.utils.misc import random_folds

from .configs import main_config


def main():
    parser = argparse.ArgumentParser(description="Generate dmri hippo splits.")
    parser.add_argument("dataset_path", type=str)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    context = main_config.get_context(
        variables=dict(DATASET_PATH=args.dataset_path))
    context.init_components()

    output_labels = ["whole_roi"]
    cbbrain_dataset = context.dataset.get_cohort_dataset(ComposeFilters([
        RequireAttributes(output_labels),
        RequireAttributes({"pathologies": "None", "rescan_id": "None"}),
        RequireAttributes({"protocol": "cbbrain"}),
    ]))
    test_filter = StratifiedFilter(size=53, continuous_attributes=["age"],
                                   discrete_attributes=["gender"], seed=args.seed)
    cbbrain_test_dataset = cbbrain_dataset.get_cohort_dataset(test_filter)
    cbbrain_cv_dataset = cbbrain_dataset.get_cohort_dataset(NegateFilter(test_filter))

    assert len(cbbrain_test_dataset) == 53
    assert len(cbbrain_cv_dataset) == 100

    num_test_male = len([s for s in cbbrain_test_dataset.subjects
                         if s["gender"] == "M"])
    ages = sorted(s["age"] for s in cbbrain_test_dataset.subjects)
    print(f"Testing males: {num_test_male}, females: {53 - num_test_male}")
    print(f"Testing ages: {ages}")

    cv_fold_ids = random_folds(len(cbbrain_cv_dataset), num_folds=5, seed=args.seed)

    ab300_validation_dataset = context.dataset.get_cohort_dataset(ComposeFilters([
        ForbidAttributes(output_labels),
        RequireAttributes({"pathologies": "None", "rescan_id": "None"}),
        RequireAttributes({"protocol": "ab300"}),
        StratifiedFilter(size=50, continuous_attributes=["age"],
                         discrete_attributes=["gender"], seed=args.seed),
    ]))
    assert len(ab300_validation_dataset) == 50

    dataset_path = Path(args.dataset_path)
    (dataset_path / "attributes").mkdir(exist_ok=True)
    with open(dataset_path / "attributes" / "cbbrain_test_subjects.json", "w") as f:
        json.dump({s["name"]: {"cbbrain_test": True}
                   for s in cbbrain_test_dataset.subjects}, f, indent=4)
    with open(dataset_path / "attributes" / "ab300_validation_subjects.json", "w") as f:
        json.dump({s["name"]: {"ab300_validation": True}
                   for s in ab300_validation_dataset.subjects}, f, indent=4)
    with open(dataset_path / "attributes" / "cross_validation_split.json", "w") as f:
        json.dump({s["name"]: {"fold": fold}
                   for s, fold in zip(cbbrain_cv_dataset.subjects, cv_fold_ids)},
                  f, indent=4)


if __name__ == "__main__":
    main()
