"""Weight providers: the streaming I/O layer.

Re-implements the reference WeightsProvider hierarchy (src/onnxstream.h:266-900)
with the same contract —

  * ``on_init(entries)``    announce the full load order before the first run
  * ``on_restart()``        rewind for the next run
  * ``get(name)``           blocking fetch of the next weight (callers consume
                            in on_init order on the hot path)
  * ``remove(name)``        drop a cached weight (op-level caches own it now)
  * ``update(name, arr)``   write a dtype-converted weight back into the cache

— but the *sink* is different: on TPU the consumer is the segment executor,
which turns host arrays into async HBM transfers (jax.device_put) so that the
next segment's weights stream over PCIe while the current segment computes on
the MXU. This replaces the reference's disk->RAM prefetch thread feeding the
op about to execute (src/onnxstream.h:356-664).
"""

from __future__ import annotations

import collections
import os
import threading
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from onnxstream_tpu.dtypes import DType


class WeightsProvider:
    """Abstract provider (reference src/onnxstream.h:266-291)."""

    def on_init(self, entries: Sequence[Tuple[str, DType, Tuple[int, ...]]]) -> None:
        """entries = (name, dtype, shape) in execution (stream) order."""

    def on_restart(self) -> None:
        pass

    def get(self, name: str, dtype: DType, shape: Tuple[int, ...]) -> np.ndarray:
        raise NotImplementedError

    def remove(self, name: str) -> None:
        pass

    def update(self, name: str, arr: np.ndarray) -> None:
        pass

    def close(self) -> None:
        pass


def _read_bin(path: str, dtype: DType, shape: Tuple[int, ...]) -> np.ndarray:
    nelem = int(np.prod(shape)) if shape else 1
    arr = np.fromfile(path, dtype=dtype.np, count=nelem)
    if arr.size != nelem:
        raise IOError(f"{path}: expected {nelem} elements of {dtype.value}, got {arr.size}")
    return arr.reshape(shape)


class CollectNamesWeightsProvider(WeightsProvider):
    """Dry-run provider: records (dtype, name, size), never loads.

    Used for download manifests / model_get_weights_names
    (reference src/onnxstream.h:293-329, src/exports.cpp:111-148).
    """

    def __init__(self) -> None:
        self.names: List[Tuple[str, DType, Tuple[int, ...]]] = []

    def on_init(self, entries) -> None:
        self.names = list(entries)

    def get(self, name, dtype, shape):
        raise RuntimeError("CollectNamesWeightsProvider records names only; it cannot load weights")

    def manifest(self) -> str:
        """`type:name|type:name|...` — format of model_get_weights_names
        (reference src/exports.cpp:130-140)."""
        return "|".join(f"{d.value}:{n}" for n, d, _ in self.names)


class DiskNoCacheWeightsProvider(WeightsProvider):
    """Blocking read of {path}{name} per request; zero residency — the
    RPI-Zero-2 mode (reference src/onnxstream.h:331-354)."""

    def __init__(self, path_prefix: str) -> None:
        self.prefix = path_prefix

    def get(self, name, dtype, shape):
        return _read_bin(self.prefix + name, dtype, shape)


class DiskPrefetchWeightsProvider(WeightsProvider):
    """Background-thread prefetcher with a bounded in-flight byte budget.

    Same protocol as the reference (src/onnxstream.h:356-664): on_init fixes
    the read order; a worker thread reads ahead until the buffered bytes would
    exceed ``max_bytes`` (always allowing one file past the limit, matching
    m_limit_plus_one_file); ``get`` pops the front entry, blocking until ready;
    ``on_restart`` rewinds. Out-of-order requests fall back to a direct read.
    """

    def __init__(self, path_prefix: str, max_bytes: int = 1 << 28) -> None:
        self.prefix = path_prefix
        self.max_bytes = max_bytes
        self._entries: List[Tuple[str, DType, Tuple[int, ...]]] = []
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._ready: "collections.OrderedDict[str, np.ndarray]" = collections.OrderedDict()
        self._buffered = 0
        self._next_read = 0
        self._next_serve = 0
        self._stop = False
        self._error: Optional[BaseException] = None
        self._thread: Optional[threading.Thread] = None

    def on_init(self, entries) -> None:
        self.close()
        self._entries = list(entries)
        self._ready.clear()
        self._buffered = 0
        self._next_read = 0
        self._next_serve = 0
        self._stop = False
        self._error = None
        self._thread = threading.Thread(target=self._worker, daemon=True, name="ostpu-prefetch")
        self._thread.start()

    def on_restart(self) -> None:
        entries = self._entries
        self.on_init(entries)

    def _worker(self) -> None:
        try:
            while True:
                with self._cv:
                    while not self._stop and (
                        self._next_read >= len(self._entries)
                        or (self._buffered > self.max_bytes and self._ready)
                    ):
                        if self._next_read >= len(self._entries):
                            return
                        self._cv.wait()
                    if self._stop:
                        return
                    name, dtype, shape = self._entries[self._next_read]
                    self._next_read += 1
                arr = _read_bin(self.prefix + name, dtype, shape)
                with self._cv:
                    self._ready[name] = arr
                    self._buffered += arr.nbytes
                    self._cv.notify_all()
        except BaseException as e:  # surfaced on the consumer (onnxstream.h:529-537)
            with self._cv:
                self._error = e
                self._cv.notify_all()

    def get(self, name, dtype, shape):
        with self._cv:
            # out-of-order request (e.g. a re-run of a single op): direct read
            in_order = (
                self._next_serve < len(self._entries) and self._entries[self._next_serve][0] == name
            )
            if not in_order and name not in self._ready:
                pass  # fall through to direct read below
            else:
                while name not in self._ready:
                    if self._error is not None:
                        raise self._error
                    self._cv.wait()
                arr = self._ready.pop(name)
                self._buffered -= arr.nbytes
                if in_order:
                    self._next_serve += 1
                self._cv.notify_all()
                return arr
        return _read_bin(self.prefix + name, dtype, shape)

    def close(self) -> None:
        if self._thread is not None:
            with self._cv:
                self._stop = True
                self._cv.notify_all()
            self._thread.join(timeout=5)
            self._thread = None


class NativeDiskPrefetchWeightsProvider(WeightsProvider):
    """DiskPrefetch via the C++ worker (csrc/prefetch.cpp -> libostpu_native.so):
    no GIL involvement on the read path, same contract as the Python version."""

    _lib = None

    @classmethod
    def available(cls) -> bool:
        return cls._load() is not None

    @classmethod
    def _load(cls):
        if cls._lib is None:
            import ctypes

            here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
            for cand in (os.path.join(here, "csrc", "libostpu_native.so"), "libostpu_native.so"):
                try:
                    lib = ctypes.CDLL(cand)
                    lib.ostpu_prefetch_new.restype = ctypes.c_void_p
                    lib.ostpu_prefetch_new.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
                    lib.ostpu_prefetch_init.argtypes = [
                        ctypes.c_void_p,
                        ctypes.POINTER(ctypes.c_char_p),
                        ctypes.POINTER(ctypes.c_uint64),
                        ctypes.c_int,
                    ]
                    lib.ostpu_prefetch_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64]
                    lib.ostpu_prefetch_get.restype = ctypes.c_int
                    lib.ostpu_prefetch_restart.argtypes = [ctypes.c_void_p]
                    lib.ostpu_prefetch_delete.argtypes = [ctypes.c_void_p]
                    cls._lib = lib
                    break
                except OSError:
                    continue
        return cls._lib

    def __init__(self, path_prefix: str, max_bytes: int = 1 << 28) -> None:
        import ctypes

        lib = self._load()
        if lib is None:
            raise OSError("libostpu_native.so not built (run `make -C csrc`)")
        self.prefix = path_prefix
        self._h = lib.ostpu_prefetch_new(path_prefix.encode(), max_bytes)
        self._entries = []

    def on_init(self, entries) -> None:
        import ctypes

        self._entries = list(entries)
        names = (ctypes.c_char_p * len(entries))(*[e[0].encode() for e in entries])
        sizes = (ctypes.c_uint64 * len(entries))(
            *[int(np.prod(e[2])) * e[1].itemsize for e in entries]
        )
        self._load().ostpu_prefetch_init(self._h, names, sizes, len(entries))

    def on_restart(self) -> None:
        self._load().ostpu_prefetch_restart(self._h)

    def get(self, name, dtype, shape):
        arr = np.empty(shape, dtype=dtype.np)
        rc = self._load().ostpu_prefetch_get(
            self._h, name.encode(), arr.ctypes.data, arr.nbytes
        )
        if rc != 0:
            raise IOError(f"native prefetch failed for {name} (rc={rc})")
        return arr

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._load().ostpu_prefetch_delete(self._h)
            self._h = None


class RamWeightsProvider(WeightsProvider):
    """Decorator: first run pulls from the inner provider and caches; later
    runs serve from RAM (reference src/onnxstream.h:666-900). ``update``
    re-stores dtype-converted weights so conversion happens once.
    """

    def __init__(self, inner: WeightsProvider) -> None:
        self.inner = inner
        self._cache: Dict[str, np.ndarray] = {}
        self._warm = False

    def on_init(self, entries) -> None:
        if not self._warm:
            self.inner.on_init(entries)

    def on_restart(self) -> None:
        if not self._warm:
            self.inner.on_restart()

    def get(self, name, dtype, shape):
        if name in self._cache:
            return self._cache[name]
        arr = self.inner.get(name, dtype, shape)
        self._cache[name] = arr
        return arr

    def remove(self, name) -> None:
        # in the warm path (weights injected via add_empty_and_return, the
        # WASM flow) the cache IS the source of truth — the inner provider
        # has nothing to re-pull from
        if not self._warm:
            self._cache.pop(name, None)

    def update(self, name, arr) -> None:
        self._cache[name] = np.asarray(arr)

    def add_empty_and_return(self, name: str, dtype: DType, shape: Tuple[int, ...]) -> np.ndarray:
        """Allocate an uninitialized cached weight the caller fills in place —
        the WASM client path (reference src/onnxstream.h add_empty_and_return_ptr,
        used by model_add_weights_file, src/exports.cpp:150-167)."""
        arr = np.empty(shape, dtype=dtype.np)
        self._cache[name] = arr
        self._warm = True
        return arr

    def mark_warm(self) -> None:
        self._warm = True

    def close(self) -> None:
        self.inner.close()


class DictWeightsProvider(WeightsProvider):
    """In-memory provider: weights supplied by the caller (the WASM
    model_add_weights_file flow, reference src/exports.cpp:150-167; also the
    natural provider for generated/test models)."""

    def __init__(self, weights: Optional[Dict[str, np.ndarray]] = None) -> None:
        self.weights: Dict[str, np.ndarray] = dict(weights or {})

    def get(self, name, dtype, shape):
        arr = self.weights[name]
        if hasattr(arr, "materialize"):  # LazyArray: host-read forces make()
            arr = arr.materialize()
        nelem = int(np.prod(shape)) if shape else 1
        if arr.size != nelem:
            raise ValueError(f"{name}: expected {nelem} elements, got {arr.size}")
        return arr.reshape(shape) if tuple(arr.shape) != tuple(shape) else arr

    def update(self, name, arr) -> None:
        self.weights[name] = np.asarray(arr)

    def remove(self, name) -> None:
        # the dict IS the source of truth (no inner provider to re-pull
        # from after a re-plan) — releasing device-resident weights must
        # not drop it
        pass


def make_provider(name: str, path_prefix: str, **kw) -> WeightsProvider:
    """Provider registry matching model_new_2's five names
    (reference src/exports.cpp:62-85)."""
    if name == "collect":
        return CollectNamesWeightsProvider()
    if name == "nocache":
        return DiskNoCacheWeightsProvider(path_prefix)
    if name == "prefetch":
        if NativeDiskPrefetchWeightsProvider.available():
            return NativeDiskPrefetchWeightsProvider(path_prefix, **kw)
        return DiskPrefetchWeightsProvider(path_prefix, **kw)
    if name == "ram":
        return RamWeightsProvider(DiskNoCacheWeightsProvider(path_prefix))
    if name == "ram+prefetch":
        return RamWeightsProvider(make_provider("prefetch", path_prefix, **kw))
    raise ValueError(f"unknown weights provider {name!r}")
