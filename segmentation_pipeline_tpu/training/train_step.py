"""The jitted data-parallel train step.

TPU-native replacement for the reference's per-iteration
forward/loss/backward/step sequence (segmentation_trainer.py:168-180): one
fused XLA program — forward (train-mode BN/dropout), hybrid loss, backward,
optax update — compiled once and fed batch-sharded arrays over the mesh's
'data' axis.  GSPMD inserts the gradient all-reduce; there is no hand-written
collective here by design.
"""
from __future__ import annotations

import copy
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .model import to_channels_last


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, optimizer, example_batch_cf: Dict[str, Any]) -> TrainState:
    """model: SegModel; example_batch_cf: {'X': (N,C,W,H,D), 'y': ...}."""
    model.ensure_initialized(example_batch_cf["X"])
    params = model.params
    opt_state = optimizer.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=model.batch_stats, opt_state=opt_state)


def _split_and_flip_cl(x: jnp.ndarray) -> jnp.ndarray:
    """Sagittal hemisphere split into the batch, channels-last (the TPU-side
    fused version of ref prediction.py:16-21). x: (N, W, H, D, C)."""
    half = x.shape[1] // 2
    first, second = x[:, :half], x[:, half:]
    return jnp.concatenate([first, jnp.flip(second, axis=1)], axis=0)


def _reverse_split_and_flip_cl(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[0] // 2
    first, second = x[:half], x[half:]
    return jnp.concatenate([first, jnp.flip(second, axis=1)], axis=1)


def _normalize_compute_dtype(compute_dtype):
    """None stays None (full f32); strings like 'bfloat16' become dtypes.
    Strings keep trainer configs picklable in Context checkpoints."""
    if compute_dtype is None:
        return None
    dtype = jnp.dtype(compute_dtype)
    if dtype == jnp.dtype(jnp.float32):
        return None
    return dtype


def _apply_stochastic_matrix_cl(y_pred: jnp.ndarray, y_prior: jnp.ndarray) -> jnp.ndarray:
    """Channels-last cascade contraction: y_pred (..., C^2) holds per-voxel
    column-stochastic C x C matrices (row-major); refined[..., row] =
    sum_col M[row, col] * prior[..., col] (see prediction.apply_stochastic_matrix)."""
    C = y_prior.shape[-1]
    M = y_pred.reshape(*y_pred.shape[:-1], C, C)
    return jnp.einsum("...rc,...c->...r", M, y_prior)


def make_train_step(module, criterion, optimizer, mesh: Optional[Mesh] = None,
                    data_axis: str = "data", sagittal_split: bool = False,
                    compute_dtype=None, refine_image: Optional[str] = None):
    """Returns train_step(state, batch_cl, rng) -> (state, metrics, y_pred).

    batch_cl: {'X': (N, W, H, D, C), 'y': (N, W, H, D, C)} channels-last.
    Forward (optionally through the sagittal-split batching trick), hybrid
    loss, backward, and the optax update fuse into one XLA program.  With a
    mesh, inputs are expected batch-sharded over ``data_axis`` and the state
    replicated; without one it is a plain single-device jit.  The (train-mode)
    prediction is returned for scheduled training evaluators
    (ref segmentation_trainer.py:182-191).

    ``compute_dtype`` ('bfloat16' or a dtype) runs the network forward and
    backward in that precision — the TPU-native mixed-precision recipe:
    params, optimizer state, BatchNorm statistics (flax computes them in
    f32 regardless of input dtype), the loss, and the returned prediction
    all stay float32; only activations and conv compute drop precision.
    The MXU accumulates bf16 matmuls in f32 internally.
    """
    compute_dtype = _normalize_compute_dtype(compute_dtype)

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params}
        # False, not []: flax returns an (out, vars) tuple for ANY list —
        # including an empty one — and a bare output only for mutable=False
        # (norm-free models have no batch_stats at all)
        mutable = False
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        x = batch["X"]
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        if sagittal_split:
            x = _split_and_flip_cl(x)
        out = module.apply(variables, x, train=True,
                           rngs={"dropout": rng}, mutable=mutable)
        if mutable:
            y_pred, new_vars = out
            new_batch_stats = new_vars.get("batch_stats", batch_stats)
        else:
            y_pred, new_batch_stats = out, batch_stats
        if sagittal_split:
            y_pred = _reverse_split_and_flip_cl(y_pred)
        y_pred = y_pred.astype(jnp.float32)
        if refine_image is not None:
            # cascade: C^2-channel transition matrices contracted with the
            # prior (batch must carry the refine image channels-last)
            y_pred = _apply_stochastic_matrix_cl(y_pred, batch[refine_image])
        loss_dict = criterion(y_pred, batch["y"])
        return loss_dict["loss"], (loss_dict, new_batch_stats, y_pred)

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng) -> tuple:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (loss_dict, new_batch_stats, y_pred)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_batch_stats, opt_state=new_opt_state)
        return new_state, loss_dict, y_pred

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    data = NamedSharding(mesh, P(data_axis))
    batch_shardings = {"X": data, "y": data}
    if refine_image is not None:
        batch_shardings[refine_image] = data
    return jax.jit(
        step_fn,
        in_shardings=(None, batch_shardings, None),
        donate_argnums=(0,),
    )


def collate_to_device(batch_cf: Dict[str, Any], mesh: Optional[Mesh] = None,
                      data_axis: Optional[str] = "data",
                      spatial_axis: Optional[str] = None) -> Dict[str, jnp.ndarray]:
    """Channel-first host batch -> channels-last device batch, batch-sharded
    over the mesh when given (the host->device boundary; the TPU analog of
    ref utils/utils.py:75-85 collate + .to(device)).  With ``spatial_axis``
    the W dimension is sharded too (the input layout for
    make_spatial_train_step).

    Dtypes are transfer-preserving: float64 downcasts to float32, but
    float32/bf16/f16 and integer arrays ship as-is — the compact-transfer
    path sends uint8 label ids (N, W, H, D; no channel axis to move) and
    bf16 inputs to cut host-link bytes."""
    import numpy as np

    out = {}
    for k, v in batch_cf.items():
        v = np.asarray(v)
        if v.dtype == np.float64:
            v = v.astype(np.float32)
        arr = jnp.asarray(v)
        if arr.ndim == 5:  # (N, C, W, H, D) -> channels-last
            arr = to_channels_last(arr)
        out[k] = arr
    if mesh is not None:
        sharding = NamedSharding(mesh, P(data_axis, spatial_axis))
        out = {k: jax.device_put(v, sharding) for k, v in out.items()}
    return out


def make_spatial_train_step(module, criterion, optimizer, mesh: Mesh,
                            spatial_axis: str = "spatial",
                            data_axis: Optional[str] = None,
                            compute_dtype=None):
    """Train step on W-sharded volumes — the scaling path for volumes whose
    activations exceed one chip's HBM (the training counterpart of
    parallel/sharded_model.py's sharded inference).

    The module is cloned with ``spatial_shard_axis`` (every conv
    halo-exchanges its margin over ICI; pooling stays shard-local; the
    trilinear upsample is global-index aware) and ``bn_axis_name`` (BatchNorm
    batch statistics pmean'd across shards — exactly the unsharded stats).
    The criterion completes its per-sample reductions with psums, so the loss
    — and therefore every device's gradient contribution — matches the
    unsharded program; a final grads psum yields the exact global gradient.

    Params and optimizer state stay replicated; ``batch_cl['X']/['y']`` are
    (N, W, H, D, C) with W sharded over ``spatial_axis`` (and N over
    ``data_axis`` when given).  Returns the same (state, loss_dict, y_pred)
    signature as make_train_step; y_pred comes back sharded.

    Requires W divisible by mesh[spatial_axis] * 2^levels (8 for
    NestedResUNet) so pooling boundaries align with shard boundaries.
    """
    axes = tuple(a for a in (data_axis, spatial_axis) if a is not None)
    sharded_module = module.clone(spatial_shard_axis=spatial_axis,
                                  bn_axis_name=axes if len(axes) > 1 else spatial_axis)
    crit = copy.copy(criterion)
    crit.spatial_axis_name = spatial_axis
    crit.batch_axis_name = data_axis
    compute_dtype = _normalize_compute_dtype(compute_dtype)

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params}
        # False, not []: flax returns an (out, vars) tuple for ANY list —
        # including an empty one — and a bare output only for mutable=False
        # (norm-free models have no batch_stats at all)
        mutable = False
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        x = batch["X"]
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        out = sharded_module.apply(variables, x, train=True,
                                   rngs={"dropout": rng}, mutable=mutable)
        if mutable:
            y_pred, new_vars = out
            new_batch_stats = new_vars.get("batch_stats", batch_stats)
        else:
            y_pred, new_batch_stats = out, batch_stats
        y_pred = y_pred.astype(jnp.float32)
        loss_dict = crit(y_pred, batch["y"])
        return loss_dict["loss"], (loss_dict, new_batch_stats, y_pred)

    def local_step(state: TrainState, batch, rng):
        levels = getattr(sharded_module, "pooling_levels", 3)
        if batch["X"].shape[1] % (2 ** levels) != 0:
            raise ValueError(
                f"Per-shard W slab of {batch['X'].shape[1]} voxels is not "
                f"divisible by 2^{levels}: shard-local pooling needs W "
                f"divisible by mesh[{spatial_axis!r}] * {2 ** levels} "
                f"(= {mesh.shape[spatial_axis] * 2 ** levels})")
        if data_axis is not None:
            # distinct dropout masks per data shard; spatial shards of the
            # same sample must keep identical channel masks, so no fold
            # over the spatial axis
            rng = jax.random.fold_in(rng, lax.axis_index(data_axis))
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (loss_dict, new_batch_stats, y_pred)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        # the loss is replicated (the criterion completed it with psums), so
        # under shard_map's replication tracking jax's transpose rules emit
        # the cross-shard grad psums automatically — no manual psum here
        # (adding one would double-count; verified exact vs the unsharded
        # step in tests/test_parallel.py)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_batch_stats,
                               opt_state=new_opt_state)
        return new_state, loss_dict, y_pred

    batch_spec = P(data_axis, spatial_axis)
    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), {"X": batch_spec, "y": batch_spec}, P()),
        out_specs=(P(), P(), batch_spec),
    )
    return jax.jit(step, donate_argnums=(0,))
