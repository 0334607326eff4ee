"""MSSEG2 training entry point.

    python -m research.msseg2.run <dataset> <logs> --fold 0
"""
import argparse

from segmentation_pipeline_tpu.loggers import FileLogger
from segmentation_pipeline_tpu.utils.dataset_files import prepare_dataset_files

from .msseg2 import get_context


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset_path")
    parser.add_argument("logging_path")
    parser.add_argument("--work-path", default=None)
    parser.add_argument("--fold", type=int, default=0)
    parser.add_argument("--max-training-time", default=None)
    parser.add_argument("--max-iterations", type=int, default=100000)
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--tpu-fast-path", action="store_true",
                        help="device_cache + device_augmentation='auto': "
                             "volumes live in HBM and the declared "
                             "augmentation pipeline (msseg2.py:44-57) runs "
                             "fused on device")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 network compute with f32 master "
                             "weights: +12.6%% sustained throughput "
                             "(PARITY.md); omit for exact reference "
                             "numerics")
    args = parser.parse_args()

    dataset_path = prepare_dataset_files(args.dataset_path, args.work_path)
    context = get_context(variables={"DATASET_PATH": str(dataset_path)},
                          fold=args.fold, tpu_fast_path=args.tpu_fast_path,
                          compute_dtype=("bfloat16" if args.bf16 else None))
    context.init_components()
    context.trainer.train(
        context=context,
        max_iterations=args.max_iterations,
        max_training_time=args.max_training_time,
        num_workers=args.num_workers,
        validation_batch_size=1,
        logger=FileLogger(args.logging_path),
    )


if __name__ == "__main__":
    main()
