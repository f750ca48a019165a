"""Decoded-image LRU cache (host-side).

PNG decode is the loader's dominant cost once augmentation is crop-level
(docs/PERF.md). Training revisits frames constantly — LineMOD repeats each
epoch 20x (``tools/train.py:67``) — so caching decoded arrays trades RAM for
decode time. Thread-safe (the loader uses a thread pool); entries are
read-only numpy arrays shared across threads.
"""

from __future__ import annotations

import collections
import threading

import numpy as np


class ImageCache:
    """LRU of path -> decoded ndarray. ``capacity`` is an entry count
    (frames), 0 disables caching."""

    def __init__(self, capacity: int = 0):
        self.capacity = capacity
        self._store: collections.OrderedDict[str, np.ndarray] = \
            collections.OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def load(self, path: str) -> np.ndarray:
        if self.capacity <= 0:
            return self._decode(path)
        with self._lock:
            arr = self._store.get(path)
            if arr is not None:
                self._store.move_to_end(path)
                self.hits += 1
                return arr
        arr = self._decode(path)
        arr.setflags(write=False)  # shared across threads: freeze
        with self._lock:
            self.misses += 1
            self._store[path] = arr
            self._store.move_to_end(path)
            while len(self._store) > self.capacity:
                self._store.popitem(last=False)
        return arr

    @staticmethod
    def _decode(path: str) -> np.ndarray:
        if path.endswith(".png"):
            from densefusion_tpu import native
            if native.decode_supported():
                arr = native.decode_png_file(path)
                if arr is not None:   # unsupported variants -> PIL
                    return arr
        from PIL import Image
        return np.array(Image.open(path))
