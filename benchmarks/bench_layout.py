"""Shape/layout sweep of the fused dmri train step.

The sustained loop's sagittal-split step (batch 8 x 48x88x24) runs ~1.3x
faster than the unsplit step (batch 4 x 96x88x24) at identical total FLOPs,
so the spatial extents/batch factorization clearly move XLA's conv tiling
efficiency. This sweeps the factorizations to attribute the win:

  base          (4, 96, 88, 24)   bench.py headline shape
  split         (8, 48, 88, 24)   sagittal split (the config's real shape)
  permWD        (4, 24, 88, 96)   W<->D permuted (same math: kernels are
                                  3^3; a consistent permutation of input
                                  and kernel axes is an isomorphic model)
  split_permWD  (8, 24, 88, 48)
  half          (4, 48, 88, 24)   half the voxels (linearity check)
  batch8        (8, 96, 88, 24)   2x voxels via batch (batch-scaling check)

Timing: one dispatch of a fori_loop chain of train steps forced by the
final loss fetch (CLAUDE.md rig methodology).
Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_layout.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from segmentation_pipeline_tpu.criterions import HybridLogisticDiceLoss
from segmentation_pipeline_tpu.models import NestedResUNet
from segmentation_pipeline_tpu.training.model import SegModel
from segmentation_pipeline_tpu.training.optimizers import Adam
from segmentation_pipeline_tpu.training.train_step import (
    collate_to_device, create_train_state, make_train_step)

SHAPES = {
    "base": (4, 96, 88, 24),
    "split": (8, 48, 88, 24),
    "permWD": (4, 24, 88, 96),
    "split_permWD": (8, 24, 88, 48),
    "half": (4, 48, 88, 24),
    "batch8": (8, 96, 88, 24),
    # does the batch-sublane win keep climbing past 8?
    "split16": (16, 48, 88, 24),
    "split32": (32, 48, 88, 24),
}


def run_one(name, shape, n_steps, compute_dtype=None):
    batch, w, h, d = shape
    model = SegModel(NestedResUNet(input_channels=3, output_channels=2,
                                   filters=40, dropout_p=0.2))
    criterion = HybridLogisticDiceLoss()
    optimizer = Adam(lr=2e-4)
    rng_np = np.random.default_rng(0)
    X = rng_np.normal(size=(batch, 3, w, h, d)).astype(np.float32)
    lab = (X[:, 0] > 0.5).astype(np.float32)
    y = np.stack([1 - lab, lab], axis=1)
    batch_cf = {"X": X, "y": y}
    state = create_train_state(model, optimizer, batch_cf)
    step = make_train_step(model.module, criterion, optimizer,
                           compute_dtype=compute_dtype)
    device_batch = collate_to_device(batch_cf)

    def chain(seed, st0):
        key = jax.random.PRNGKey(seed)

        def body(i, carry):
            st, _ = carry
            st, ld, _ = step(st, device_batch, jax.random.fold_in(key, i))
            return st, ld["loss"]

        _, loss = lax.fori_loop(0, n_steps, body,
                                (st0, jnp.zeros((), jnp.float32)))
        return loss

    chain_jit = jax.jit(chain)
    fresh = lambda: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jnp.array(a, copy=True), state)
    float(chain_jit(0, fresh()))
    t0 = time.time()
    float(chain_jit(1, fresh()))
    dt = time.time() - t0
    ms = dt / n_steps * 1000
    voxels = batch * w * h * d
    print(json.dumps({"variant": name, "shape": list(shape),
                      "ms_per_step": round(ms, 1),
                      "Mvoxel_per_sec": round(voxels / (dt / n_steps) / 1e6, 1)}),
          flush=True)


def main():
    n_steps = int(os.environ.get("BENCH_STEPS", "30"))
    only = os.environ.get("VARIANTS")
    dtype = os.environ.get("DTYPE") or None  # e.g. DTYPE=bfloat16
    names = [n for n in SHAPES if not only or n in only.split(",")]
    if os.environ.get("BENCH_INPROC") == "1":
        for name in names:
            run_one(name if not dtype else f"{name}[{dtype}]", SHAPES[name],
                    n_steps, compute_dtype=dtype)
        return
    # Default: one timeout-bounded subprocess per variant. A pathological
    # compile of one experimental shape can hang the whole backend (see
    # CLAUDE.md rig quirks); isolating variants keeps the rest of the sweep
    # alive and bounds the damage.
    import subprocess
    import sys
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["BENCH_INPROC"] = "1"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    budget = int(os.environ.get("BENCH_TIMEOUT", "900"))
    for name in names:
        env["VARIANTS"] = name
        try:
            subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, timeout=budget, check=False)
        except subprocess.TimeoutExpired:
            print(json.dumps({"variant": name, "error": "timeout",
                              "seconds": budget}), flush=True)


if __name__ == "__main__":
    main()
