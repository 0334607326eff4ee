"""Channel-width sweep: does padding model channels toward the MXU lane
width recover the low single-chip MFU? (VERDICT r1 item 4 / NEXT_STEPS #3.)

The dmri_hippo NestedResUNet uses filters=40 (ref main_config.py:123-127);
v5e MXU lanes are 128 wide, so C=40 convs waste lanes. This sweep measures
the fused train step (fwd+loss+bwd+Adam) at the dmri shape for
filters in {40, 48, 64, 128} x {f32, bf16}, reporting volumes/sec and
volumes/sec *per unit of model FLOPs* (FLOPs grow ~quadratically with
filters, so raw throughput alone can't show whether wider is
hardware-friendlier).

Methodology: one dispatch of a lax.fori_loop chain forced by fetching the
final loss (bench.py; the tunnel memoizes repeated dispatches and
block_until_ready can be a no-op).

Env: FILTERS="40,48,64,128", DTYPES="float32,bfloat16", BENCH_STEPS=30.
"""
import json
import os
import time

import numpy as np


def measure(filters: int, compute_dtype, n_steps: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from segmentation_pipeline_tpu.criterions import HybridLogisticDiceLoss
    from segmentation_pipeline_tpu.models import NestedResUNet
    from segmentation_pipeline_tpu.training.model import SegModel
    from segmentation_pipeline_tpu.training.optimizers import Adam
    from segmentation_pipeline_tpu.training.train_step import (
        collate_to_device, create_train_state, make_train_step)

    batch = 4
    model = SegModel(NestedResUNet(input_channels=3, output_channels=2,
                                   filters=filters, dropout_p=0.2))
    criterion = HybridLogisticDiceLoss()
    optimizer = Adam(lr=2e-4)
    rng_np = np.random.default_rng(0)
    X = rng_np.normal(size=(batch, 3, 96, 88, 24)).astype(np.float32)
    lab = (X[:, 0] > 0.5).astype(np.float32)
    y = np.stack([1 - lab, lab], axis=1)
    batch_cf = {"X": X, "y": y}
    state = create_train_state(model, optimizer, batch_cf)
    step = make_train_step(model.module, criterion, optimizer,
                           compute_dtype=compute_dtype)
    device_batch = collate_to_device(batch_cf)

    def chain(seed, state):
        key = jax.random.PRNGKey(seed)

        def body(i, carry):
            st, _ = carry
            st, ld, _ = step(st, device_batch, jax.random.fold_in(key, i))
            return st, ld["loss"]

        _, loss = lax.fori_loop(0, n_steps, body,
                                (state, jnp.zeros((), jnp.float32)))
        return loss

    chain_jit = jax.jit(chain)

    def fresh():
        return jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), state)

    float(chain_jit(0, fresh()))  # compile + warm
    t0 = time.time()
    float(chain_jit(1, fresh()))
    dt = time.time() - t0

    # per-step cost model for normalization: conv FLOPs scale ~f^2
    flops = None
    try:
        lowered = jax.jit(
            lambda st, b, k: step(st, b, k)).lower(
                fresh(), device_batch, jax.random.PRNGKey(0))
        analysis = lowered.compile().cost_analysis()
        if analysis:
            a = analysis[0] if isinstance(analysis, (list, tuple)) else analysis
            flops = float(a.get("flops", 0.0)) or None
    except Exception:
        pass
    return batch * n_steps / dt, flops


def main():
    filter_list = [int(f) for f in
                   os.environ.get("FILTERS", "40,48,64,128").split(",")]
    dtypes = os.environ.get("DTYPES", "float32,bfloat16").split(",")
    n_steps = int(os.environ.get("BENCH_STEPS", "30"))

    rows = []
    for f in filter_list:
        for dt in dtypes:
            compute_dtype = None if dt == "float32" else dt
            vps, flops = measure(f, compute_dtype, n_steps)
            tflops_s = (flops * vps / 4 / 1e12) if flops else None
            rows.append({"filters": f, "dtype": dt,
                         "volumes_per_sec": round(vps, 2),
                         "step_tflops": round(flops / 1e12, 3) if flops else None,
                         "achieved_tflops_per_sec":
                             round(tflops_s, 2) if tflops_s else None})
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
