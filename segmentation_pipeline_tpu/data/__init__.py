from .dataset_fingerprint import get_dataset_fingerprint
from .subject_filters import (
    AnyFilter,
    ComposeFilters,
    ForbidAttributes,
    NegateFilter,
    RandomFoldFilter,
    RandomSelectFilter,
    RequireAttributes,
    StratifiedFilter,
    SubjectFilter,
)
from .subject_folder import SubjectFolder
from .subject_loaders import (
    AttributeLoader,
    ComposeLoaders,
    ImageLoader,
    SubjectLoader,
    TensorLoader,
)

__all__ = [k for k in dir() if not k.startswith("_")]
