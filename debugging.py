"""Scratch entry: load an ensemble checkpoint context for interactive poking
(counterpart of ref debugging.py:12-27).

    python debugging.py <checkpoint.ckpt> [dataset_path]
"""
import sys

from segmentation_pipeline_tpu import Context


def load(checkpoint_path, dataset_path="."):
    context = Context(file_path=checkpoint_path,
                      variables=dict(DATASET_PATH=str(dataset_path)))
    context.keep_components(("model", "dataset", "trainer"))
    context.init_components()
    return context


if __name__ == "__main__":
    ctx = load(*sys.argv[1:3])
    print(ctx)
    print("model params:", ctx.model.num_params)
