"""Data pipelines.

Reference surface (SURVEY.md §2.1): ``common/cifar10.py`` (unpickle + infinite
shuffled generator), per-model ImageNet/CelebA loaders, and pix2pix's
queue-runner paired-image pipeline. TPU-native replacements are host-side
numpy iterators feeding a double-buffered HBM prefetch
(``parallel.prefetch_to_device``); every loader has a deterministic synthetic
twin (``fake.py``) because loaders must be testable with no datasets on disk.

All image batches are NHWC float32 in [-1, 1] (scaled at the edge, like the
reference) with int32 labels where conditional.
"""

from .base import DataSource, microbatch_stack
from .fake import (DeviceFakeImages, DeviceFakePairedImages,
                   FakeImages, FakePairedImages)
from .cifar10 import Cifar10
from .imagenet import ImageFolderByClass, ImageFolderFlat, ImageNetNpz
from .paired import PairedImageFolder
from .multires import MultiResolution
from .packed import (PackedImageStore, PackedPairedStore, is_packed_dir,
                     open_pyramid, resolve_pyramid_dir)
from .device_cache import (DeviceCachedPairedStore, DeviceCachedStore,
                           packed_paired_training_source,
                           packed_training_source)
from .pipeline import ThreadedSource

__all__ = [
    "DataSource", "microbatch_stack",
    "FakeImages", "FakePairedImages", "DeviceFakeImages",
    "DeviceFakePairedImages",
    "Cifar10", "ImageNetNpz", "ImageFolderByClass", "ImageFolderFlat",
    "PairedImageFolder",
    "MultiResolution",
    "PackedImageStore", "PackedPairedStore", "is_packed_dir", "open_pyramid",
    "resolve_pyramid_dir",
    "DeviceCachedStore", "packed_training_source",
    "DeviceCachedPairedStore", "packed_paired_training_source",
    "ThreadedSource",
]
