from .records import DataRecord, FileRecord  # noqa: F401
from .letterbox import letterbox_resize  # noqa: F401
from .color import ColorJitter, hsv_to_rgb, rgb_to_hsv  # noqa: F401
from .affine import RandomAffine  # noqa: F401
from .mosaic import MosaicMixer  # noqa: F401
from .datasets import (  # noqa: F401
    IiiDataset,
    CocoDataset,
    CsvDataset,
    SanitizedDataset,
    VocDataset,
    load_classes_file,
)
from .cache import (  # noqa: F401
    FileCache, MemoryCache, OnDemandLoader, make_decode_loader,
)
from .pipeline import TrainingStream, TrainingStreamConfig  # noqa: F401
