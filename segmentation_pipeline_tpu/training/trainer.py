"""SegmentationTrainer: the scheduled-evaluation training loop.

Behavioral parity with ref segmentation_trainer.py:18-300 — iteration-based
training with interval-scheduled evaluators over named cohorts, model
scoring + best-checkpoint tracking, early stopping, wall-clock budget with a
save buffer, and cooperative SIGINT/SIGTERM/SIGUSR2 preemption — built around
the fused jitted train step (training/train_step.py) instead of a Python
forward/backward sequence.  The forward+loss+backward+update is one XLA
program; the host does scheduling, evaluation, and logging only.
"""
from __future__ import annotations

import math
import os
import signal
import threading
import time
from typing import Callable, Optional, Sequence, Union

import jax
import numpy as np

from ..data.loader import DataLoaderFactory
from ..evaluators import Evaluator
from ..loggers import Logger, NonLogger
from ..prediction import Predictor, _attach_prediction, add_evaluation_labels
from ..utils.misc import auto_str, time_str_to_seconds
from ..utils.timer import Timer
from .model import to_channels_first
from .train_step import (TrainState, collate_to_device, make_spatial_train_step,
                         make_train_step)

EXIT = threading.Event()
EXIT.clear()


def _clean_exit_handler(signum, frame):
    EXIT.set()
    print("Exiting cleanly", flush=True)


def install_signal_handlers():
    """SIGINT/SIGTERM/SIGUSR2 -> clean-exit event (SLURM preemption,
    ref segmentation_trainer.py:22-30). Safe to call from the main thread
    only; the trainer calls it lazily.  Returns {signum: previous handler}
    so train() can restore them on exit — otherwise Ctrl+C would be
    permanently swallowed for the rest of the process after one training
    run."""
    previous = {}
    previous[signal.SIGINT] = signal.signal(signal.SIGINT,
                                            _clean_exit_handler)
    previous[signal.SIGTERM] = signal.signal(signal.SIGTERM,
                                             _clean_exit_handler)
    if os.name != "nt":
        previous[signal.SIGUSR2] = signal.signal(signal.SIGUSR2,
                                                 _clean_exit_handler)
    return previous


def restore_signal_handlers(previous):
    for signum, handler in (previous or {}).items():
        try:
            signal.signal(signum, handler)
        except (ValueError, TypeError):  # non-main thread / exotic handler
            pass


class ScheduledEvaluation:
    def __init__(self, evaluator: Evaluator, log_name: str,
                 cohorts: Sequence[str] = None, subjects: Sequence[str] = None,
                 interval: int = 1):
        assert not (cohorts and subjects), \
            "One of cohorts or subjects may be provided, but not both."
        self.evaluator = evaluator
        self.log_name = log_name
        self.cohorts = cohorts
        self.subjects = subjects
        self.interval = interval

    def __repr__(self):
        return auto_str(self)


class SegmentationTrainer:
    #: startup line-item accounting from the latest train() call
    #: (class-level fallback so pre-existing pickled trainers resume)
    startup_phases: dict = {}

    def __init__(self, training_batch_size: int, save_rate: int,
                 scoring_interval: int, scoring_function: Callable,
                 one_time_evaluators: Sequence[ScheduledEvaluation],
                 training_evaluators: Sequence[ScheduledEvaluation],
                 validation_evaluators: Sequence[ScheduledEvaluation],
                 max_iterations_with_no_improvement: int,
                 train_predictor: Predictor, validation_predictor: Predictor,
                 train_dataloader_factory: DataLoaderFactory,
                 validation_dataloader_factory: DataLoaderFactory,
                 mesh=None, device_augmentation: Optional[dict] = None,
                 spatial_axis: Optional[str] = None,
                 compute_dtype: Optional[str] = None,
                 device_cache: bool = False,
                 defer_metric_fetch: bool = True,
                 device_confusion: Optional[bool] = None):
        self.training_batch_size = training_batch_size
        self.save_rate = save_rate
        self.scoring_interval = scoring_interval
        self.scoring_function = scoring_function
        # stored but never executed — exact reference parity: the reference
        # trainer also only stores them (ref segmentation_trainer.py:60,73;
        # every in-repo config passes [])
        self.one_time_evaluators = one_time_evaluators
        self.training_evaluators = training_evaluators
        self.validation_evaluators = validation_evaluators
        self.max_iterations_with_no_improvement = max_iterations_with_no_improvement
        self.train_predictor = train_predictor
        self.validation_predictor = validation_predictor
        self.train_dataloader_factory = train_dataloader_factory
        self.validation_dataloader_factory = validation_dataloader_factory
        self.mesh = mesh
        # optional fused on-device augmentation applied to each training
        # batch: an ops/augment.py config dict ({} for defaults), or "auto"
        # to derive the config from the training cohort's DECLARED transform
        # pipeline (training/auto_augment.py) — the reference's declarative
        # augmentation semantics (ref main_config.py:86-100) on the
        # TPU-native path, with the deterministic prefix/suffix left on host
        if isinstance(device_augmentation, str) \
                and device_augmentation != "auto":
            raise ValueError(
                f"device_augmentation={device_augmentation!r}: pass a config "
                f"dict, {{}} for defaults, None, or 'auto'")
        self.device_augmentation = device_augmentation
        # spatially-sharded training: shard each volume's W axis over this
        # mesh axis and train through make_spatial_train_step (whole volumes
        # beyond one chip's HBM; see docs/scaling.md). The mesh's 'data'
        # axis (if present and >1) adds batch parallelism on top.
        self.spatial_axis = spatial_axis
        if spatial_axis is not None and mesh is None:
            raise ValueError("spatial_axis requires a mesh")
        # mixed-precision training: run the network fwd/bwd in this dtype
        # (e.g. 'bfloat16' — the TPU-native half precision); params, optimizer
        # state, BN statistics, and the loss stay float32 (train_step.py).
        # A string keeps the trainer definition picklable in checkpoints.
        self.compute_dtype = compute_dtype
        # device-resident dataset cache: with a deterministic host pipeline
        # the training set uploads ONCE and batches become on-device index
        # gathers — steady-state H2D traffic is a few int32 indices (see
        # data/device_cache.py). Forces pretransform; pair with
        # device_augmentation so augs still vary per step.
        self.device_cache = device_cache
        # overlap the per-iteration metric round trip with the NEXT step's
        # device work: on iterations with no scheduled evaluator/checkpoint/
        # scoring, the stacked loss fetch is deferred one iteration (the
        # values are identical — only when the host reads them changes).
        # One D2H round trip costs ~24 ms on high-latency links (PARITY.md),
        # which is ~12% of a dmri iteration. Set False to log synchronously.
        self.defer_metric_fetch = defer_metric_fetch
        # on-device validation confusion reduction: when a sweep's
        # evaluators are all SegmentationEvaluators on (y_pred_eval, y_eval)
        # and the validation predictor argmaxes on device, per-class counts
        # are reduced ON DEVICE and only (L+1)^2 scalars are fetched per
        # subject. Self-validating: the first eligible sweep runs BOTH paths
        # and the device path only takes over on exact count agreement
        # (training/device_confusion.py). None/True = enabled, False = off.
        self.device_confusion = device_confusion

        self.iteration = 0
        self.max_score = float("-inf")
        self.max_score_iteration = -1
        self._train_state: Optional[TrainState] = None

    def _spatial_data_axis(self) -> Optional[str]:
        """Batch axis accompanying spatial sharding: the mesh's 'data' axis
        when it exists with size > 1."""
        if self.mesh is not None and "data" in self.mesh.axis_names \
                and self.mesh.shape["data"] > 1:
            return "data"
        return None

    # ---- checkpoint state ---------------------------------------------
    def state_dict(self):
        state = {
            "iteration": self.iteration,
            "max_score": self.max_score,
            "max_score_iteration": self.max_score_iteration,
        }
        if self._train_state is not None:
            state["opt_state"] = jax.tree_util.tree_map(
                np.asarray, self._train_state.opt_state)
        return state

    def load_state_dict(self, state):
        self.iteration = state["iteration"]
        self.max_score = state["max_score"]
        self.max_score_iteration = state["max_score_iteration"]
        self._restored_opt_state = state.get("opt_state")

    # ---- training ------------------------------------------------------
    def train(self, context, max_iterations: int = None,
              max_training_time: Optional[Union[int, str]] = None,
              preload_training_data: bool = False,
              pretransform_training_data: bool = False,
              preload_validation_data: bool = False,
              num_workers: int = 0, validation_batch_size: int = 16,
              logger: Logger = None, force_continue: bool = False):
        logger = logger or NonLogger()
        # a previous signal-stopped run must not poison this one: EXIT is
        # process-global and was never cleared on re-entry (a second
        # train() call after Ctrl+C exited after one iteration)
        EXIT.clear()
        self._prev_signal_handlers = None
        if threading.current_thread() is threading.main_thread():
            self._prev_signal_handlers = install_signal_handlers()

        if max_training_time is not None:
            training_time = time_str_to_seconds(max_training_time)
            save_buffer = min(int(training_time * 0.1), 5 * 60)
            stop_time = time.time() + training_time - save_buffer
        else:
            stop_time = math.inf

        if force_continue:
            self.max_score = float("-inf")
            self.max_score_iteration = self.iteration

        print("Initializing logger.")
        logger.setup(context)

        # startup line-item accounting (benchmarks/soak.py reads this):
        # wall seconds per pre-loop phase + the first iteration / first
        # sweep (compile or cache-deserialize dominated)
        phases = self.startup_phases = {}
        t_train_entry = time.time()

        training_dataset = context.dataset.get_cohort_dataset("training")

        # Resolve device_augmentation="auto": derive the fused device config
        # from the cohort's declared pipeline and swap the dataset onto the
        # deterministic remainder (prefix preprocessing + model-io suffix).
        device_aug = self.device_augmentation
        hybrid_spec = None
        probe_subject = None  # auto-aug spacing probe, reused for metadata
        if device_aug == "auto" \
                and training_dataset.transform is getattr(
                    self, "_auto_aug_host_transform", object()):
            # in-process train() re-entry: the dataset already carries the
            # deterministic remainder from the first resolution — re-deriving
            # from it would find no randomness and silently disable the
            # device augmentation the declared pipeline asked for
            device_aug = self.resolved_device_augmentation
            hybrid_spec = getattr(self, "_resolved_hybrid_spec", None)
        elif device_aug == "auto":
            from .auto_augment import derive_hybrid_augmentation, describe_config

            declared = training_dataset.transform
            host_t, aug_cfg, hybrid_spec = derive_hybrid_augmentation(declared)
            if aug_cfg is None and hybrid_spec is None:
                print("device_augmentation='auto': the training pipeline "
                      "declares no stochastic transforms; device "
                      "augmentation disabled.")
                device_aug = None
            else:
                if hybrid_spec is not None and not self.device_cache:
                    # no cached batch to splice into: run the peeled host
                    # stage inline (prefix + peeled + suffix), keep the
                    # derived window on device as usual
                    host_t = hybrid_spec.host_inline
                    hybrid_spec = None
                training_dataset.set_transform(host_t)
                self._auto_aug_host_transform = host_t
                # mm-parameterized augs (blur/elastic) need the spacing AT
                # the augmentation point: probe one transformed sample
                if aug_cfg is not None and (
                        aug_cfg.get("blur_p", 0) or aug_cfg.get("elastic_p", 0)
                        or aug_cfg.get("spatial_mode") == "oneof"):
                    probe_subject = training_dataset[0]
                    spacing = tuple(float(s)
                                    for s in probe_subject["X"].spacing)
                    _, aug_cfg, _ = derive_hybrid_augmentation(declared,
                                                               spacing)
                device_aug = aug_cfg
                msg = (describe_config(aug_cfg) if aug_cfg is not None
                       else "(all device stages off)")
                if hybrid_spec is not None:
                    msg += f" + per-batch host stage {hybrid_spec}"
                print(f"device_augmentation='auto': {msg}")
        # expose the resolved config (None / dict) for tests and dryruns
        self.resolved_device_augmentation = device_aug
        self._resolved_hybrid_spec = hybrid_spec

        # Frozen-augmentation guard: device_cache pretransforms the training
        # set ONCE into HBM; a still-stochastic host pipeline would bake a
        # single random draw in for the whole run — silently training on one
        # frozen augmentation instead of the declared distribution.
        if self.device_cache:
            from .auto_augment import contains_random

            if not training_dataset._pretransformed \
                    and contains_random(training_dataset.transform):
                raise ValueError(
                    "device_cache=True pretransforms the training set once, "
                    "which would FREEZE the stochastic transforms in the "
                    "training pipeline into a single draw baked into HBM. "
                    "Pass device_augmentation='auto' to map them onto the "
                    "fused device pipeline (training/auto_augment.py), or "
                    "strip them from the cohort transform explicitly.")

        if preload_training_data or pretransform_training_data:
            t = time.time()
            print("Preloading training data...")
            if pretransform_training_data:
                # apply the (deterministic) pipeline once; per-iteration host
                # work shrinks to deepcopy+collate — pair with
                # device_augmentation so augs still vary every step
                from .auto_augment import contains_random

                if contains_random(training_dataset.transform):
                    import warnings

                    warnings.warn(
                        "pretransform_training_data=True freezes the "
                        "stochastic transforms in the training pipeline into "
                        "a single draw (reference preload semantics, ref "
                        "segmentation_trainer.py:126-139). Pass "
                        "device_augmentation='auto' to keep augmenting per "
                        "step on device.")
                training_dataset.preload_and_transform_subjects()
            else:
                training_dataset.preload_subjects()
            phases["preload_train_s"] = round(time.time() - t, 2)
            print(f"Done. Took {phases['preload_train_s']}s")

        for scheduled in self.validation_evaluators:
            if scheduled.cohorts is None and scheduled.subjects is None:
                raise ValueError(
                    f"Validation evaluator {scheduled.log_name!r} needs "
                    f"cohorts= or subjects= — with neither it would silently "
                    f"never run (training evaluators may omit both; they "
                    f"evaluate the current batch)")
        validation_filter = self.get_filter_from_scheduled_evaluations(
            context.dataset, self.validation_evaluators)
        validation_dataset = context.dataset.get_cohort_dataset(validation_filter)
        if preload_validation_data:
            t = time.time()
            print("Preloading validation data...")
            validation_dataset.preload_and_transform_subjects()
            phases["preload_val_s"] = round(time.time() - t, 2)
            print(f"Done. Took {phases['preload_val_s']}s")
            # preloaded validation subjects are static across sweeps, so the
            # predictor can keep their device uploads alive (cache_inputs
            # auto mode; pass cache_inputs=False to opt out). HBM footprint:
            # ~n_subjects x padded-volume bytes per cached variant, bounded
            # at Image.DEVICE_MIRROR_MAX variants per image (core/subject.py)
            if getattr(self.validation_predictor, "cache_inputs", False) is None:
                self.validation_predictor.cache_inputs = True

        training_iterator = None
        if not self.device_cache:
            training_dataloader = self.train_dataloader_factory.get_data_loader(
                dataset=training_dataset, batch_size=self.training_batch_size,
                num_workers=num_workers)

            def infinite(loader):
                while True:
                    yield from loader

            training_iterator = infinite(training_dataloader)

        # label attributes for wrapping raw predictions as LabelMaps
        # (ref :153-158) — reuse the auto-aug spacing probe when it ran:
        # host transforms cost seconds at msseg2 scale and dataset[0]
        # applies the full pipeline
        sample = probe_subject if probe_subject is not None \
            else training_dataset[0]
        label_attributes = dict(sample["y"].metadata)

        # per-run device-confusion state machine (probe -> on/off)
        confusion_mgr = None
        if self.device_confusion is not False:
            from .device_confusion import DeviceConfusionManager

            confusion_mgr = DeviceConfusionManager(label_attributes)
        # exposed for tests/dryruns to assert the probe outcome
        self._confusion_mgr = confusion_mgr

        # Build the fused train step
        model = context.model
        # validation sweeps run through the predictors, which honor
        # model.compute_dtype — keep their numerics/speed consistent with
        # the training step's mixed-precision mode (explicit model setting
        # wins if the user already chose one)
        if self.compute_dtype is not None \
                and getattr(model, "compute_dtype", "absent") is None:
            model.compute_dtype = self.compute_dtype
        criterion = context.criterion
        optimizer = context.optimizer
        sagittal_split = getattr(self.train_predictor, "sagittal_split", False)

        train_step = None

        timer = Timer()
        rng = jax.random.PRNGKey(self.iteration)
        max_iterations = int(max_iterations if max_iterations is not None else 10 ** 9)

        refine_image = getattr(self.train_predictor, "refine_image", None)
        if refine_image is not None and device_aug is not None:
            raise ValueError(
                "device_augmentation with a refine_image (cascade) predictor "
                "is not supported: geometric augmentation would misalign the "
                "prior — augment in the host pipeline instead")
        if self.spatial_axis is not None and device_aug is not None:
            raise ValueError(
                "device_augmentation with spatial_axis (W-sharded volumes) "
                "is not supported: the fused warp's computed-index gathers "
                "would force GSPMD to reshard/replicate the full volume — "
                "the very thing spatial sharding exists to avoid. Augment "
                "in the host pipeline, or drop spatial_axis")

        # Compact host->device transfer: one-hot labels ship as uint8 ids
        # (expanded back on device — bit-identical) and, under bf16 mixed
        # precision, X ships as bf16 (the same rounding the device cast
        # would apply). Cuts per-iteration H2D bytes ~3-10x; decisive on
        # bandwidth-limited host links. Re-verified on EVERY batch (the
        # check is O(batch) host work, negligible next to the step) so
        # mixed datasets / soft labels are never silently argmaxed into
        # corrupted uint8 targets — a non-one-hot batch ships full float.
        compact_state = {"n_classes": 0}
        x_np_dtype = None
        if self.compute_dtype is not None:
            import jax.numpy as jnp

            dt = jnp.dtype(self.compute_dtype)
            if dt != jnp.dtype(jnp.float32):
                x_np_dtype = dt

        def _maybe_compact_y(y_cf):
            from ..data.device_cache import is_exact_onehot

            if is_exact_onehot(y_cf, axis=1):
                compact_state["n_classes"] = int(y_cf.shape[1])
                return np.argmax(y_cf, axis=1).astype(np.uint8)
            return y_cf

        def _expand_batch(batch):
            """On-device: ids -> one-hot channels-last float32."""
            import jax.numpy as jnp

            if batch["y"].ndim == 4:  # (N, W, H, D) ids
                batch["y"] = jax.nn.one_hot(
                    batch["y"], compact_state["n_classes"], dtype=jnp.float32)
            return batch

        # Device-resident cache: training set uploaded once, batches are
        # on-device index gathers (data/device_cache.py); the host link
        # leaves the steady-state loop entirely.
        cache = None
        index_iterator = None
        hybrid_rt = None
        if self.device_cache:
            if self.spatial_axis is not None:
                raise ValueError(
                    "device_cache with spatial sharding is not supported")
            if refine_image is not None:
                raise ValueError(
                    "device_cache with a refine_image (cascade) predictor is "
                    "not supported — the prior is prediction-dependent")
            from ..data.device_cache import DeviceDataCache, DevicePatchCache
            from ..data.loader import (PatchDataLoader, RandomSampler,
                                       StandardDataLoader)

            if not isinstance(self.train_dataloader_factory,
                              (StandardDataLoader, PatchDataLoader)):
                raise ValueError(
                    "device_cache supports StandardDataLoader (whole-volume) "
                    "and PatchDataLoader (device-side patch sampling) "
                    "factories")
            if not training_dataset._pretransformed:
                t = time.time()
                print("Pretransforming training data for the device cache...")
                training_dataset.preload_and_transform_subjects()
                phases["pretransform_s"] = round(time.time() - t, 2)
                print(f"Done. Took {phases['pretransform_s']}s")
            t = time.time()

            # with device augmentation in the loop, keep one-hot labels as
            # uint8 ids through the warp (bit-identical, Cx4 less gather
            # traffic) and expand after augmenting
            expand_in_cache = device_aug is None
            if isinstance(self.train_dataloader_factory, StandardDataLoader):
                cache = DeviceDataCache(training_dataset.subjects,
                                        x_dtype=x_np_dtype, mesh=self.mesh,
                                        expand_onehot=expand_in_cache)
                if hybrid_spec is not None:
                    from .hybrid_augment import HybridHostAugment

                    hybrid_rt = HybridHostAugment(
                        training_dataset.subjects, hybrid_spec,
                        x_dtype=x_np_dtype, mesh=self.mesh)
                    # exposed for tests: the runtime holds the PRETRANSFORMED
                    # subjects the per-batch stage actually reads
                    self._hybrid_rt = hybrid_rt
                    print(f"hybrid device cache: static channels cached, "
                          f"{hybrid_spec.n_channels} channel(s) "
                          f"({', '.join(hybrid_spec.image_order)}) "
                          f"regenerated on host per batch")
                sampler_cls = self.train_dataloader_factory.sampler or RandomSampler

                def infinite_indices():
                    # FULL batches only: the jitted device gather is shaped
                    # (and, on a mesh, sharded) for training_batch_size, so
                    # an epoch tail smaller than the batch would crash the
                    # data-axis sharding (and recompile on one device).
                    # The stream is infinite, so the tail simply carries
                    # into the next epoch's permutation — every subject
                    # still appears exactly once per epoch.
                    carry = []
                    while True:
                        order = carry + list(iter(sampler_cls(training_dataset)))
                        n_full = (len(order) // self.training_batch_size
                                  * self.training_batch_size)
                        carry = order[n_full:]
                        for j in range(0, n_full, self.training_batch_size):
                            yield order[j:j + self.training_batch_size]
            else:
                if hybrid_spec is not None:
                    raise ValueError(
                        "hybrid device augmentation (host channel "
                        "resynthesis) is not supported with PatchDataLoader "
                        "— patches are sliced on device so the regenerated "
                        "channel has no whole-volume slot to splice into; "
                        "use StandardDataLoader or device_cache=False")
                # patch training: volumes + center CDFs cached on device,
                # centers drawn and patches sliced there; the host feeds
                # only the queue-balanced subject-id stream
                cache = DevicePatchCache(
                    training_dataset.subjects,
                    sampler=self.train_dataloader_factory.sampler,
                    x_dtype=x_np_dtype, mesh=self.mesh,
                    expand_onehot=expand_in_cache)
                spv = self.train_dataloader_factory.samples_per_volume

                def infinite_indices():
                    import random as _random

                    # full batches only (see the whole-volume variant above)
                    carry = []
                    while True:  # tio.Queue balance: spv patches/subject/epoch
                        order = [i for i in range(len(training_dataset))
                                 for _ in range(spv)]
                        _random.shuffle(order)
                        order = carry + order
                        n_full = (len(order) // self.training_batch_size
                                  * self.training_batch_size)
                        carry = order[n_full:]
                        for j in range(0, n_full, self.training_batch_size):
                            yield order[j:j + self.training_batch_size]

            phases["cache_build_s"] = round(time.time() - t, 2)
            # exposed for tests: the dataset whose (pretransformed) subjects
            # back the cache
            self._cache_dataset = training_dataset
            print(f"Device cache: {cache.n_subjects} subjects, "
                  f"{cache.nbytes / 2 ** 20:.0f} MiB in HBM")
            if cache._is_onehot and not expand_in_cache:
                compact_state["n_classes"] = cache.n_classes
            index_iterator = infinite_indices()

        def fetch_and_upload():
            """Pull the next batch from the host pipeline and start its
            async H2D transfer. Called while the device is busy with the
            current step so the upload rides under the compute."""
            if cache is not None:
                nonlocal rng
                idx = next(index_iterator)
                if hasattr(cache, "sample"):  # DevicePatchCache
                    rng, sample_key = jax.random.split(rng)
                    batch, starts = cache.sample(idx, sample_key)

                    def subjects_thunk(_idx=tuple(idx), _starts=starts):
                        # host patch subjects (recorded Crop, invertible
                        # history) recreated from the device-drawn starts —
                        # only when a training evaluator needs them
                        from ..data.loader import extract_patch

                        starts_np = np.asarray(_starts)
                        return [extract_patch(training_dataset.subjects[i],
                                              starts_np[k], cache.patch_size)
                                for k, i in enumerate(_idx)]

                    return subjects_thunk, dict(batch)

                def subjects_thunk(_idx=tuple(idx)):
                    # host Subject copies materialized only when a scheduled
                    # training evaluator actually needs them
                    import copy as _copy

                    return [_copy.deepcopy(training_dataset.subjects[i])
                            for i in _idx]

                batch = dict(cache.gather(idx))
                if hybrid_rt is not None:
                    # regenerate the stochastic channels on host and splice
                    # them into the gathered cached X (this runs inside the
                    # prefetch slot, so the host work and the upload of the
                    # small channel block hide under the device step)
                    batch["X"] = hybrid_rt.apply(batch["X"], idx)
                return subjects_thunk, batch
            subjects = next(training_iterator)
            X = np.stack([np.asarray(s["X"].data) for s in subjects]).astype(np.float32)
            y = np.stack([np.asarray(s["y"].data) for s in subjects]).astype(np.float32)
            if self.spatial_axis is not None:
                # spatial sharding keeps the classic full-precision layout
                data_axis = self._spatial_data_axis()
                return subjects, collate_to_device(
                    {"X": X, "y": y}, mesh=self.mesh, data_axis=data_axis,
                    spatial_axis=self.spatial_axis)
            batch_cf = {"X": X if x_np_dtype is None else X.astype(x_np_dtype),
                        "y": _maybe_compact_y(y)}
            if refine_image is not None:
                # cascade prior rides along for the train step's refinement
                batch_cf[refine_image] = np.stack(
                    [np.asarray(s[refine_image].data) for s in subjects]
                ).astype(np.float32)
            batch_dev = collate_to_device(batch_cf, mesh=self.mesh)
            if device_aug is None:
                batch_dev = _expand_batch(batch_dev)
            # else: compact uint8 ids warp through the device augmentation
            # first (bit-identical, far less gather traffic), expanded after
            return subjects, batch_dev

        pending = None  # (subjects, device_batch) prefetched last iteration

        # deferred per-iteration metric record (defer_metric_fetch): the
        # stacked loss scalars stay ON DEVICE for one iteration so their
        # D2H round trip (~24 ms on high-latency links) overlaps the next
        # step's device work instead of serializing after it. Values are
        # identical; only when the host reads them changes. Iterations with
        # scheduled evaluators/checkpoints/scoring process synchronously.
        deferred = None

        def flush_deferred():
            nonlocal deferred
            if deferred is None:
                return
            vals = np.asarray(deferred["stack"])
            rec = {k: float(v) for k, v in zip(deferred["keys"], vals)}
            rec["timer"] = deferred["timer"]
            rec["iteration"] = deferred["iteration"]
            logger.log(rec)
            deferred = None

        phases["setup_s"] = round(time.time() - t_train_entry, 2)
        t_loop_start = time.time()
        try:
            for _ in range(max_iterations):
                timer.start()

                if pending is None:
                    subjects, batch = fetch_and_upload()
                else:
                    subjects, batch = pending
                timer.stamp("data_loading")

                if train_step is None:
                    # stay on device: pulling the whole first batch D2H just
                    # to re-upload one example costs seconds on a slow host
                    # link (ensure_initialized only needs a single
                    # channel-first example; jnp ops keep it device-side)
                    import jax.numpy as jnp

                    model.ensure_initialized(
                        jnp.moveaxis(batch["X"][:1], -1, 1))
                    restored = getattr(self, "_restored_opt_state", None)
                    if restored is not None:
                        import jax.numpy as jnp

                        opt_state = jax.tree_util.tree_map(jnp.asarray, restored)
                        self._restored_opt_state = None
                    elif self._train_state is not None:
                        # re-entering train() in-process (the reference's
                        # torch optimizer object persists across train()
                        # calls, ref segmentation_trainer.py:33,162): keep
                        # the live moments/accumulation counters instead of
                        # silently resetting them — but only when the state
                        # still matches the current optimizer/params (a
                        # swapped optimizer component or re-initialized
                        # model would otherwise fail opaquely inside the
                        # jitted step, or silently carry stale moments)
                        opt_state = self._train_state.opt_state
                        # eval_shape: structure+shape info with ZERO device
                        # allocation (a real init would transiently double
                        # the optimizer state in HBM — decisive on the
                        # memory-tight qsm config)
                        fresh_abs = jax.eval_shape(optimizer.init,
                                                   model.params)
                        same = (jax.tree_util.tree_structure(opt_state)
                                == jax.tree_util.tree_structure(fresh_abs))
                        if same:
                            shapes = jax.tree_util.tree_map(
                                lambda a: np.shape(a), opt_state)
                            fresh_shapes = jax.tree_util.tree_map(
                                lambda a: tuple(a.shape), fresh_abs)
                            same = shapes == fresh_shapes
                        if not same:
                            print("trainer: optimizer/param structure "
                                  "changed since the previous train() call "
                                  "— reinitializing optimizer state")
                            opt_state = optimizer.init(model.params)
                    else:
                        opt_state = optimizer.init(model.params)
                    self._train_state = TrainState(
                        step=np.int32(self.iteration), params=model.params,
                        batch_stats=model.batch_stats, opt_state=opt_state)
                    if self.spatial_axis is not None:
                        train_step = make_spatial_train_step(
                            model.module, criterion, optimizer, self.mesh,
                            spatial_axis=self.spatial_axis,
                            data_axis=self._spatial_data_axis(),
                            compute_dtype=self.compute_dtype)
                    else:
                        train_step = make_train_step(model.module, criterion,
                                                     optimizer, mesh=self.mesh,
                                                     sagittal_split=sagittal_split,
                                                     compute_dtype=self.compute_dtype,
                                                     refine_image=refine_image)

                if device_aug is not None:
                    from ..ops.augment import augment_batch

                    aug_cfg = dict(device_aug)
                    if "affine_batching" not in aug_cfg:
                        # lax.map keeps the warp's gathers unbatched (2.4x on
                        # one chip, PARITY.md) but a scan over a SHARDED
                        # batch axis would serialize devices; sharded meshes
                        # keep vmap (per-device sub-batches are small, so the
                        # batched-gather penalty mostly vanishes anyway)
                        data_sharded = (
                            self.mesh is not None
                            and self.mesh.shape.get("data", 1) > 1)
                        aug_cfg["affine_batching"] = (
                            "vmap" if data_sharded else "map")
                    rng, aug_rng = jax.random.split(rng)
                    batch["X"], batch["y"] = augment_batch(
                        aug_rng, batch["X"], batch["y"], config=aug_cfg)
                    batch = _expand_batch(batch)  # ids -> one-hot, post-warp
                rng, step_rng = jax.random.split(rng)
                self._train_state, loss_dict, y_pred_cl = train_step(
                    self._train_state, batch, step_rng)
                model.update_variables(self._train_state.params,
                                       self._train_state.batch_stats)

                # software pipeline: while the dispatched step runs on device,
                # load + upload the NEXT batch, then block on this step's metrics
                try:
                    pending = fetch_and_upload()
                except StopIteration:  # infinite iterator in practice
                    pending = None
                timer.stamp("next_batch_prefetch")

                # one stacked fetch: per-scalar float() costs one blocking host
                # round trip each, which adds up on high-latency links
                import jax.numpy as jnp

                loss_keys = list(loss_dict)
                loss_stack = jnp.stack([loss_dict[k] for k in loss_keys])

                # flush LAST iteration's deferred record first: its step has
                # completed (or completes while this one queues), so its
                # round trip overlaps this iteration's device work
                flush_deferred()

                # the scheduled lists drive BOTH the busy predicate and
                # the evaluator blocks below — computed once so the
                # deferred-fetch gate can never drift from the code that
                # needs a synchronous fetch
                scheduled_train = [s for s in self.training_evaluators
                                   if self.iteration % s.interval == 0]
                scheduled_validation = [s for s in self.validation_evaluators
                                        if self.iteration % s.interval == 0]
                busy = (
                    not self.defer_metric_fetch
                    or bool(scheduled_train)
                    or bool(scheduled_validation)
                    or self.iteration % self.save_rate == 0
                    or (self.scoring_function is not None
                        and self.iteration % self.scoring_interval == 0))
                if not busy:
                    # logging-only iteration: defer the fetch one iteration
                    timer.stamp("train_step")
                    deferred = {"keys": loss_keys, "stack": loss_stack,
                                "timer": dict(timer.timestamps),
                                "iteration": self.iteration}
                else:
                    loss_vals = np.asarray(loss_stack)
                    loss_dict = {k: float(v)
                                 for k, v in zip(loss_keys, loss_vals)}
                    timer.stamp("train_step", sync_on=y_pred_cl)

                # Scheduled training evaluators see the train-mode predictions
                training_evaluations = {}
                if scheduled_train:
                    if callable(subjects):  # device-cache lazy batch subjects
                        subjects = subjects()
                    y_pred_cf = np.asarray(to_channels_first(y_pred_cl))
                    if device_aug is not None:
                        # the prediction lives in the augmented geometry: write
                        # the augmented target back so the evaluator compares
                        # aligned volumes (the reference augments in the host
                        # pipeline, so its subject['y'] is augmented too)
                        y_aug_cf = np.asarray(to_channels_first(batch["y"]))
                    for i, subject in enumerate(subjects):
                        if device_aug is not None and "y" in subject:
                            subject["y"].set_data(
                                y_aug_cf[i].astype(np.asarray(subject["y"].data).dtype))
                        _attach_prediction(subject, y_pred_cf[i], label_attributes)
                    add_evaluation_labels(subjects)
                for scheduled in scheduled_train:
                    training_evaluations[scheduled.log_name] = scheduled.evaluator(subjects)
                    timer.stamp(f"evaluation.{scheduled.log_name}")

                # Scheduled validation sweep
                validation_evaluations = {}
                if scheduled_validation:
                    t_sweep = time.time()
                    validation_filter = self.get_filter_from_scheduled_evaluations(
                        context.dataset, scheduled_validation)
                    validation_dataset.set_cohort(validation_filter)
                    validation_dataloader = self.validation_dataloader_factory.get_data_loader(
                        dataset=validation_dataset, batch_size=validation_batch_size,
                        num_workers=num_workers)
                    use_dev_confusion = False
                    if confusion_mgr is not None \
                            and confusion_mgr.state != "off":
                        from .device_confusion import sweep_spec

                        spec = sweep_spec(
                            scheduled_validation, self.validation_predictor)
                        use_dev_confusion = spec is not None
                        if use_dev_confusion:
                            confusion_mgr.configure_sweep(spec)
                    probe_sweep = (use_dev_confusion
                                   and confusion_mgr.state == "probe")
                    validation_subjects = []
                    for val_subjects in validation_dataloader:
                        if use_dev_confusion:
                            self.validation_predictor._confusion_plan = \
                                confusion_mgr
                        try:
                            val_subjects, _ = self.validation_predictor.predict(
                                model, val_subjects,
                                label_attributes=label_attributes)
                        finally:
                            self.validation_predictor._confusion_plan = None
                        # confusion-only subjects (validated device counts,
                        # no fetched prediction) need no eval-label inversion
                        add_evaluation_labels(
                            [s for s in val_subjects if "y_pred" in s])
                        validation_subjects += val_subjects
                    if probe_sweep:
                        # first eligible sweep ran BOTH paths: switch the
                        # device reduction on only on exact count agreement
                        # (also strips unvalidated device entries when the
                        # probe failed mid-sweep — the evaluators below
                        # must not consume them)
                        confusion_mgr.validate_probe(validation_subjects)
                    validation_subjects_map = {s["name"]: s for s in validation_subjects}
                    timer.stamp("model_forward_evaluation")

                    for scheduled in scheduled_validation:
                        if scheduled.cohorts is not None:
                            cohort_evaluations = {}
                            validation_evaluations[scheduled.log_name] = cohort_evaluations
                            for cohort_name in scheduled.cohorts:
                                subject_filter = validation_dataset.cohorts[cohort_name]
                                filtered = subject_filter(validation_subjects)
                                # ALWAYS produce the cohort key — the
                                # reference does (ref :229-233), and config
                                # scoring functions index
                                # log_dict[log_name][cohort_name]; a
                                # silently missing key crashes far from the
                                # root cause
                                cohort_evaluations[cohort_name] = \
                                    scheduled.evaluator(filtered)
                                timer.stamp(f"evaluation.{scheduled.log_name}.{cohort_name}")
                        elif scheduled.subjects is not None:
                            filtered = [validation_subjects_map[name]
                                        for name in scheduled.subjects]
                            validation_evaluations[scheduled.log_name] = \
                                scheduled.evaluator(filtered)
                            timer.stamp(f"evaluation.{scheduled.log_name}")
                    phases.setdefault("first_sweep_s",
                                      round(time.time() - t_sweep, 2))

                if busy:
                    log_dict = {**loss_dict, **training_evaluations,
                                **validation_evaluations}

                if self.iteration % self.save_rate == 0:
                    logger.save_context(context, "checkpoints/", self.iteration)
                    timer.stamp("save_checkpoint")

                # scoring_function=None disables scoring, best-checkpoint
                # tracking, and score-based early stopping (the reference
                # crashes on None, ref segmentation_trainer.py:250-251 —
                # gating is the obvious contract).
                if (self.scoring_function is not None
                        and self.iteration % self.scoring_interval == 0):
                    new_score = float(self.scoring_function(log_dict))
                    log_dict["model_score"] = new_score
                    if new_score > self.max_score:
                        self.max_score = new_score
                        self.max_score_iteration = self.iteration
                        logger.save_context(context, "best_checkpoints/", self.iteration)
                        timer.stamp("save_best_checkpoint")

                if busy:
                    log_dict["timer"] = dict(timer.timestamps)
                    log_dict["iteration"] = self.iteration
                    logger.log(log_dict)

                iterations_with_no_improvement = self.iteration - self.max_score_iteration
                if (self.scoring_function is not None and
                        iterations_with_no_improvement > self.max_iterations_with_no_improvement):
                    print(f"Training stopped on iteration {self.iteration} due to not "
                          f"improving for {iterations_with_no_improvement} iterations.")
                    break

                if EXIT.is_set() or time.time() > stop_time:
                    if EXIT.is_set():
                        print("Training stopped early due to manual exit signal.")
                    else:
                        print("Training time expired.")
                    break

                phases.setdefault("first_iteration_s",
                                  round(time.time() - t_loop_start, 2))
                self.iteration += 1

            flush_deferred()
            print("Saving context...")
            logger.save_context(context, "checkpoints/", self.iteration)
        finally:
            # hand the process's signal handling back: without this, SIGINT
            # keeps mapping to the clean-exit event after train() returns and
            # the user can never Ctrl+C subsequent work
            restore_signal_handlers(
                getattr(self, "_prev_signal_handlers", None))
            # drain pending async checkpoint writes before returning — the
            # exit checkpoint must be durable the moment train() returns
            # (SLURM preemption semantics, ref segmentation_trainer.py:279-280).
            # Duck-typed loggers (tests) may not define close().
            close = getattr(logger, "close", None)
            if close is not None:
                import sys

                # inside a finally during exception propagation, exc_info()
                # is the in-flight exception; inside the except below it
                # would be the close failure — so sample it here
                unwinding = sys.exc_info()[0] is not None
                try:
                    close()
                except Exception:
                    if not unwinding:
                        # clean exit: a failed drain means the exit checkpoint
                        # may not be durable — that IS the train() outcome
                        raise
                    # error path: never mask the real training exception with
                    # a logging-teardown failure
                    import traceback

                    print("Warning: logger close failed while handling an "
                          "earlier error:", flush=True)
                    traceback.print_exc()

    def get_filter_from_scheduled_evaluations(self, dataset, scheduled_evaluations):
        from ..data.subject_filters import AnyFilter, RequireAttributes

        filters = []
        for scheduled in scheduled_evaluations:
            if scheduled.cohorts is not None:
                filters += [dataset.cohorts[name] for name in scheduled.cohorts]
            elif scheduled.subjects is not None:
                filters.append(RequireAttributes({"name": scheduled.subjects}))
        return AnyFilter(filters)
