"""segmentation_pipeline_tpu — a TPU-native 3D medical-image segmentation
framework (JAX/XLA/Pallas/pjit).

Re-designed from scratch with the capability surface of
efirdc/Segmentation-Pipeline (see SURVEY.md): declarative datasets,
invertible preprocessing/augmentation, patch-based training, sliding-window
inference, scheduled-evaluation training, ensembling/TTA, Dice-family
metrics — with the compute path built for TPU (device meshes, fused XLA
kernels, Pallas conv3d) rather than translated from torch.

The flat facade mirrors ref segmentation_pipeline/__init__.py:1-26.
"""
from .core import (
    Image,
    LabelMap,
    ScalarImage,
    Subject,
    collate_subjects,
    read_nifti,
    slice_volume,
    write_nifti,
)
from .data import (
    AnyFilter,
    AttributeLoader,
    ComposeFilters,
    ComposeLoaders,
    ForbidAttributes,
    ImageLoader,
    NegateFilter,
    RandomFoldFilter,
    RandomSelectFilter,
    RequireAttributes,
    StratifiedFilter,
    SubjectFilter,
    SubjectFolder,
    SubjectLoader,
    TensorLoader,
    get_dataset_fingerprint,
)
from .criterions import HybridLogisticDiceLoss
from .data.device_cache import DeviceDataCache
from .data.loader import (
    DataLoaderFactory,
    LabelSampler,
    PatchDataLoader,
    PatchQueue,
    RandomSampler,
    SequentialSampler,
    StandardDataLoader,
    SubjectsLoader,
    UniformSampler,
    WeightedSampler,
)
from .loggers import FileLogger, Logger, NonLogger, WandbLogger
from .models import (
    Block3d,
    BlurConv3d,
    BlurConvTranspose3d,
    ModularUNet,
    NestedResUNet,
    StochasticMatrix,
    WSConv3d,
)
from .models.ensemble import (EnsembleAffines, EnsembleFlips, EnsembleModels,
                              EnsembleOrientations)
from .prediction import (
    PatchPredict,
    Predictor,
    StandardPredict,
    add_evaluation_labels,
    apply_stochastic_matrix,
)
from .evaluators import (
    ContourImageEvaluator,
    Evaluator,
    ImageRegionEvaluator,
    InstanceSegmentationEvaluator,
    LabeledTensor,
    LabelMapEvaluator,
    SegmentationEvaluator,
)
from .training import (
    Adam,
    list_checkpoint_files,
    collate_to_device,
    Context,
    create_train_state,
    make_spatial_train_step,
    make_train_step,
    Ref,
    TrainState,
    ScheduledEvaluation,
    SegmentationTrainer,
    SegModel,
    SGD,
    TorchContext,
)
from .transforms import *  # noqa: F401,F403
from .utils import filter_kwargs, flatten_nested_dict, no_op, time_str_to_seconds
from .utils.misc import auto_str, random_folds
from .utils.dataset_files import prepare_dataset_files
from .utils.timer import Timer
from .utils.compact_json import CompactJSONEncoder
from .utils.compile_cache import (enable_compilation_cache,
                                  enable_compilation_cache_from_env)

# honor SP_COMPILATION_CACHE (persistent XLA executable cache across
# processes — SLURM array tasks, preemption relaunches; utils/compile_cache)
enable_compilation_cache_from_env()
from .utils.nn_unet_convert import save_dataset_as_nn_unet
from .evaluators.instance_segmentation_evaluator import msseg_detection_test
from .visualizations import vis_features, vis_model, vis_subject
from .post_processing import (
    keep_components,
    remove_holes,
    remove_small_components,
    sort_by_size,
    unsort_by_size,
)
from .typing import PathLike
from .parallel.mesh import MeshRecipe, make_mesh
from . import post_processing
from . import ops, parallel, native  # noqa: F401

__version__ = "0.1.0"
