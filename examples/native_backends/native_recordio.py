"""C++ threaded record reader (EXAMPLE — demoted from the package in
round 5; see README.md in this directory).

Same iterator + ``state()``/``restore_state()`` contract as the package's
``utils.recordio.RecordReader`` (the supported, measured-faster numpy
memmap reader), backed by ``recordio.cpp``: a worker pool off the GIL
fills a bounded in-order queue of ready batches; Python pops a batch with
one memcpy and hands out numpy views per field.

The two backends use different epoch-permutation algorithms
(cycle-walking bijection here vs numpy Fisher-Yates), so their shuffled
orders differ from each other; shard disjointness and deterministic
resume hold within either.
"""

from __future__ import annotations

import ctypes
import os
import sys
import threading
from typing import Dict

import numpy as np

from multi_modal_transformers_tokenmerge_tpu.utils.recordio import (
    _read_header)

# sibling imports (native_build) work no matter where this is run from
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

__all__ = ["NativeRecordReader"]

_SRC = os.path.join(os.path.dirname(__file__), "recordio.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_recordio.so")
_build_lock = threading.Lock()
_lib = None


def _load_lib():
    global _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        from native_build import build_native_lib
        lib = build_native_lib(_SRC, _SO, extra_flags=("-pthread",))
        lib.rio_open.restype = ctypes.c_void_p
        lib.rio_open.argtypes = [ctypes.c_char_p]
        lib.rio_open_multi.restype = ctypes.c_void_p
        lib.rio_open_multi.argtypes = [ctypes.c_char_p]
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
                                  ctypes.c_int, ctypes.c_int,
                                  ctypes.c_uint32, ctypes.c_uint32]
        lib.rio_next_batch.restype = ctypes.c_int
        lib.rio_next_batch.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_uint8)]
        lib.rio_skip.restype = None
        lib.rio_skip.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.rio_close.restype = None
        lib.rio_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeRecordReader:
    """Iterate batches (dicts of numpy arrays) from record file(s) through
    the C++ worker pool."""

    def __init__(self, path, batch_size: int, shuffle_seed=None,
                 num_threads: int = 2, queue_depth: int = 4,
                 copy_fields: bool = False,
                 shard_id: int = 0, num_shards: int = 1):
        paths = [path] if isinstance(path, (str, os.PathLike)) else list(path)
        if not paths:
            raise ValueError("need at least one record file")
        self.path = paths[0]
        self.paths = [os.fspath(p) for p in paths]
        self.batch_size = batch_size
        headers = [_read_header(p) for p in self.paths]
        self.schema, self.record_size = headers[0][0], headers[0][1]
        for p, (schema, rec_size, _, _) in zip(self.paths[1:], headers[1:]):
            if schema != self.schema or rec_size != self.record_size:
                raise ValueError(
                    f"{p}: schema/record_size differs from {self.paths[0]}")
        self.num_records = sum(h[2] for h in headers)
        if not (0 <= shard_id < num_shards):
            raise ValueError(f"shard_id {shard_id} not in [0, {num_shards})")
        self.shard_id, self.num_shards = shard_id, num_shards
        self._shard_span = self.num_records // num_shards
        if batch_size <= 0 or batch_size > self._shard_span:
            raise ValueError(
                f"batch_size {batch_size} invalid for {self._shard_span} "
                f"records per shard")
        self.shuffle_seed = shuffle_seed
        self.copy_fields = copy_fields
        lib = _load_lib()
        handle = lib.rio_open_multi("\n".join(self.paths).encode("utf-8"))
        if not handle:
            raise RuntimeError(f"rio_open failed for {self.paths}")
        rc = lib.rio_start(
            handle, batch_size, num_threads,
            0 if shuffle_seed is None else int(shuffle_seed),
            0 if shuffle_seed is None else 1, queue_depth,
            shard_id, num_shards)
        if rc != 0:
            lib.rio_close(handle)
            raise RuntimeError("rio_start failed")
        self._handle = handle
        self._lib = lib
        self._consumed = 0
        self._closed = False

    @property
    def batches_per_epoch(self) -> int:
        return self._shard_span // self.batch_size

    def _split(self, flat: np.ndarray) -> Dict[str, np.ndarray]:
        rec_dtype = np.dtype([(name, np.dtype(dt), tuple(shape))
                              for name, shape, dt in self.schema])
        assert rec_dtype.itemsize == self.record_size
        recs = flat.view(rec_dtype)
        if self.copy_fields:
            return {name: np.ascontiguousarray(recs[name])
                    for name, _, _ in self.schema}
        return {name: recs[name] for name, _, _ in self.schema}

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        if self._closed:
            raise StopIteration
        buf = np.empty(self.batch_size * self.record_size, dtype=np.uint8)
        rc = self._lib.rio_next_batch(
            self._handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc == -2:
            raise RuntimeError(
                f"record read failed in {self.path!r} (truncated file or "
                "IO error)")
        if rc != 0:
            raise StopIteration
        self._consumed += 1
        return self._split(buf)

    def state(self) -> Dict[str, int]:
        return {"consumed": self._consumed}

    def restore_state(self, state: Dict[str, int]) -> "NativeRecordReader":
        consumed = int(state["consumed"])
        if self._consumed:
            raise ValueError("restore_state requires a fresh reader")
        self._lib.rio_skip(self._handle, consumed)  # O(1) fast-forward
        self._consumed = consumed
        return self

    def close(self):
        self._closed = True
        if self._handle is not None:
            self._lib.rio_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def _self_test():
    """Correctness smoke vs the package's numpy reader: same records per
    epoch (order may differ), deterministic resume."""
    import tempfile

    from multi_modal_transformers_tokenmerge_tpu.utils.recordio import (
        RecordReader, write_records)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.rec")
        n = 64
        write_records(path, ({"x": np.full((3,), i, np.int32)}
                             for i in range(n)))
        def one_epoch(reader):
            out = []
            for _ in range(8):
                out.extend(int(v) for v in next(reader)["x"][:, 0])
            return sorted(out)

        native = NativeRecordReader(path, batch_size=8, shuffle_seed=7)
        assert one_epoch(native) == list(range(n)), (
            "native epoch must cover all records")

        numpy_r = RecordReader(path, batch_size=8, shuffle_seed=7)
        assert one_epoch(numpy_r) == list(range(n))

        # deterministic resume: reader B fast-forwarded to A's state
        # continues A's exact stream
        a = NativeRecordReader(path, batch_size=8, shuffle_seed=9)
        for _ in range(5):
            next(a)
        b = NativeRecordReader(path, batch_size=8,
                               shuffle_seed=9).restore_state(a.state())
        np.testing.assert_array_equal(next(a)["x"], next(b)["x"])
    print("native_recordio self-test OK")


if __name__ == "__main__":
    _self_test()
