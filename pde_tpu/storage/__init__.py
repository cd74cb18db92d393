"""Storage of simulation time series."""

from .base import StorageBase, StorageTracker, StorageView
from .file import FileStorage
from .memory import MemoryStorage, get_memory_storage

try:
    from .movie import MovieStorage
except ImportError:  # pragma: no cover — ffmpeg support is optional
    pass
