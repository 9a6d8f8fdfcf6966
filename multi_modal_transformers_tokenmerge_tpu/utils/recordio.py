"""Fixed-record binary dataset format with a native threaded reader.

The reference has no data-loading layer at all (SURVEY.md §1); robot-policy
training data (images + actions + instruction ids per step) is fixed-shape,
which this format exploits: every record is the same byte size, so batch
assembly is pure ``pread`` at computed offsets — no parsing on the hot
path.  The C++ reader (``utils/native/recordio.cpp``) runs a worker pool
off the GIL that fills a bounded in-order queue of ready batches; Python
pops a batch with one memcpy and hands numpy views per field.  Pair with
``utils.data.prefetch_to_device`` to overlap host IO with device compute.

A pure-numpy fallback reader keeps everything working without a C++
toolchain.

Format (little-endian):
  magic "MMTRECv1" | u32 schema_len | schema JSON | u32 record_size |
  u64 num_records | records...
Schema JSON: ``[[name, [shape...], dtype_str], ...]``.
"""

from __future__ import annotations

import ctypes
import json
import os
import struct
import threading
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

__all__ = ["write_records", "RecordReader", "record_schema_of"]

_MAGIC = b"MMTRECv1"
_SRC = os.path.join(os.path.dirname(__file__), "native", "recordio.cpp")
_SO = os.path.join(os.path.dirname(__file__), "native", "_recordio.so")
_build_lock = threading.Lock()
_lib = None

Schema = List[Tuple[str, Tuple[int, ...], str]]


def record_schema_of(example: Dict[str, np.ndarray]) -> Schema:
    return [(k, tuple(v.shape), str(v.dtype))
            for k, v in sorted(example.items())]


def _record_nbytes(schema: Schema) -> int:
    return sum(int(np.prod(shape)) * np.dtype(dt).itemsize
               for _, shape, dt in schema)


def write_records(path: str, examples: Iterable[Dict[str, np.ndarray]],
                  schema: Schema = None) -> int:
    """Write examples (dicts of fixed-shape arrays) to ``path``.
    Returns the number of records written."""
    it = iter(examples)
    first = None
    if schema is None:
        first = next(it)
        schema = record_schema_of(first)
    blob = json.dumps(schema).encode("utf-8")
    rec_size = _record_nbytes(schema)
    n = 0
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(blob)))
        f.write(blob)
        f.write(struct.pack("<I", rec_size))
        count_pos = f.tell()
        f.write(struct.pack("<Q", 0))

        def emit(ex):
            nonlocal n
            for name, shape, dt in schema:
                arr = np.ascontiguousarray(ex[name], dtype=np.dtype(dt))
                if arr.shape != tuple(shape):
                    raise ValueError(
                        f"field {name!r}: shape {arr.shape} != "
                        f"schema {tuple(shape)}")
                f.write(arr.tobytes())
            n += 1

        if first is not None:
            emit(first)
        for ex in it:
            emit(ex)
        f.seek(count_pos)
        f.write(struct.pack("<Q", n))
    return n


def _native_available() -> bool:
    from .native_build import toolchain_available
    return toolchain_available()


def _load_lib():
    global _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        from .native_build import build_native_lib
        lib = build_native_lib(_SRC, _SO, extra_flags=("-pthread",))
        lib.rio_open.restype = ctypes.c_void_p
        lib.rio_open.argtypes = [ctypes.c_char_p]
        lib.rio_num_records.restype = ctypes.c_uint64
        lib.rio_num_records.argtypes = [ctypes.c_void_p]
        lib.rio_record_size.restype = ctypes.c_uint32
        lib.rio_record_size.argtypes = [ctypes.c_void_p]
        lib.rio_schema.restype = ctypes.c_int
        lib.rio_schema.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_int]
        lib.rio_start.restype = ctypes.c_int
        lib.rio_start.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                  ctypes.c_int, ctypes.c_uint64,
                                  ctypes.c_int, ctypes.c_int]
        lib.rio_next_batch.restype = ctypes.c_int
        lib.rio_next_batch.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_uint8)]
        lib.rio_close.restype = None
        lib.rio_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def _read_header(path: str):
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise ValueError(f"{path}: not an MMTRECv1 file")
        (schema_len,) = struct.unpack("<I", f.read(4))
        schema = json.loads(f.read(schema_len).decode("utf-8"))
        schema = [(name, tuple(shape), dt) for name, shape, dt in schema]
        (rec_size,) = struct.unpack("<I", f.read(4))
        (num_records,) = struct.unpack("<Q", f.read(8))
        data_off = f.tell()
    return schema, rec_size, num_records, data_off


class RecordReader:
    """Iterate batches (dicts of numpy arrays) from a record file.

    ``backend='native'`` uses the C++ threaded reader; ``'numpy'`` is the
    pure-Python fallback; ``'auto'`` picks native when a toolchain exists.
    Iteration is infinite (epochs stream back to back); batches within an
    epoch cover distinct records (shuffled by a per-epoch permutation when
    ``shuffle_seed`` is given; remainder records beyond the last full batch
    of an epoch are dropped).  Each backend's shuffle is deterministic
    given the seed, but the two backends use different permutation
    algorithms (cycle-walking bijection vs numpy Fisher-Yates), so their
    orders differ from each other.
    """

    def __init__(self, path: str, batch_size: int, shuffle_seed=None,
                 num_threads: int = 2, queue_depth: int = 4,
                 backend: str = "auto", copy_fields: bool = False):
        self.path = path
        self.batch_size = batch_size
        self.schema, self.record_size, self.num_records, self._data_off = (
            _read_header(path))
        if batch_size <= 0 or batch_size > self.num_records:
            raise ValueError(
                f"batch_size {batch_size} invalid for "
                f"{self.num_records} records")
        self.shuffle_seed = shuffle_seed
        self.copy_fields = copy_fields
        if backend == "auto":
            backend = "native" if _native_available() else "numpy"
        self.backend = backend
        self._handle = None
        if backend == "native":
            lib = _load_lib()
            handle = lib.rio_open(path.encode("utf-8"))
            if not handle:
                raise RuntimeError(f"rio_open failed for {path}")
            rc = lib.rio_start(
                handle, batch_size, num_threads,
                0 if shuffle_seed is None else int(shuffle_seed),
                0 if shuffle_seed is None else 1, queue_depth)
            if rc != 0:
                lib.rio_close(handle)
                raise RuntimeError("rio_start failed")
            self._handle = handle
            self._lib = lib
        elif backend != "numpy":
            raise ValueError(f"unknown backend {backend!r}")
        self._epoch = 0
        self._pos = 0
        self._perm = None
        self._mm = None  # lazy memmap for the numpy backend
        self._consumed = 0  # batches handed out (for state()/restore_state)

    @property
    def batches_per_epoch(self) -> int:
        return self.num_records // self.batch_size

    def _split(self, flat: np.ndarray) -> Dict[str, np.ndarray]:
        """One batch buffer -> per-field arrays, ZERO-copy by default: the
        records are reinterpreted through a structured dtype, so each field
        is a view into the batch buffer (device_put consumes strided views
        fine).  Caveat of views: every field shares the batch buffer as
        ``.base`` — retaining one small field pins the whole batch's
        memory, and the fields alias one mutable buffer.  Consumers that
        hold fields beyond the step (or mutate them) should construct the
        reader with ``copy_fields=True`` for independent per-field arrays.
        """
        rec_dtype = np.dtype([(name, np.dtype(dt), tuple(shape))
                              for name, shape, dt in self.schema])
        assert rec_dtype.itemsize == self.record_size, (
            rec_dtype.itemsize, self.record_size)
        recs = flat.view(rec_dtype)
        if self.copy_fields:
            return {name: np.ascontiguousarray(recs[name])
                    for name, _, _ in self.schema}
        return {name: recs[name] for name, _, _ in self.schema}

    def _next_numpy(self) -> np.ndarray:
        if self._perm is None or self._pos + self.batch_size > (
                self.batches_per_epoch * self.batch_size):
            rng = (np.random.default_rng(
                (self.shuffle_seed or 0) + self._epoch)
                if self.shuffle_seed is not None else None)
            self._perm = (rng.permutation(self.num_records)
                          if rng is not None
                          else np.arange(self.num_records))
            self._epoch += 1
            self._pos = 0
        idx = self._perm[self._pos:self._pos + self.batch_size]
        self._pos += self.batch_size
        if self._mm is None:
            # one memmap for the reader's lifetime (the per-batch
            # open/seek/read pattern costs thousands of syscalls per
            # second on the training hot path; episodes.py uses the
            # same memmap approach)
            self._mm = np.memmap(self.path, dtype=np.uint8, mode="r")
        rs = self.record_size
        buf = np.empty(self.batch_size * rs, dtype=np.uint8)
        for i, rec in enumerate(idx):
            off = self._data_off + int(rec) * rs
            buf[i * rs:(i + 1) * rs] = self._mm[off:off + rs]
        return buf

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        if self._handle is not None:
            buf = np.empty(self.batch_size * self.record_size,
                           dtype=np.uint8)
            rc = self._lib.rio_next_batch(
                self._handle,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if rc == -2:
                raise RuntimeError(
                    f"record read failed in {self.path!r} (truncated file "
                    "or IO error)")
            if rc != 0:
                raise StopIteration
        else:
            buf = self._next_numpy()
        self._consumed += 1
        return self._split(buf)

    # -- mid-epoch resume --------------------------------------------------

    def state(self) -> Dict[str, int]:
        """Serializable position: checkpoint it next to the train state so
        a resumed run continues the data order instead of replaying (or
        skipping) examples."""
        return {"consumed": self._consumed}

    def restore_state(self, state: Dict[str, int]) -> "RecordReader":
        """Fast-forward a FRESH reader (same path/batch_size/shuffle_seed)
        to a ``state()`` snapshot.  Each backend's order is deterministic
        given the seed, so the resumed stream continues exactly.

        numpy backend: O(1) counter math.  native backend: the C++ worker
        pool owns the position, so the stream is replayed and discarded —
        O(consumed) reads (sequential, no Python per record); for very
        long runs prefer checkpointing at epoch boundaries.
        """
        consumed = int(state["consumed"])
        if self._consumed:
            raise ValueError(
                "restore_state requires a fresh reader (already consumed "
                f"{self._consumed} batches)")
        if self._handle is not None:
            for _ in range(consumed):
                buf = np.empty(self.batch_size * self.record_size,
                               dtype=np.uint8)
                rc = self._lib.rio_next_batch(
                    self._handle,
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
                if rc != 0:
                    raise RuntimeError("record replay failed during "
                                       "restore_state")
        else:
            bpe = self.batches_per_epoch
            full_epochs, rem = divmod(consumed, bpe)
            rng = (np.random.default_rng(
                (self.shuffle_seed or 0) + full_epochs)
                if self.shuffle_seed is not None else None)
            self._perm = (rng.permutation(self.num_records)
                          if rng is not None
                          else np.arange(self.num_records))
            self._epoch = full_epochs + 1
            self._pos = rem * self.batch_size
        self._consumed = consumed
        return self

    def close(self):
        if self._handle is not None:
            self._lib.rio_close(self._handle)
            self._handle = None
        self._mm = None  # drop the memmap (and its file descriptor)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
