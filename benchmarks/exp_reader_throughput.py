"""Record-loader throughput: native (C++ worker pool, now an example —
examples/native_backends) vs the supported numpy backend.

Host-side measurement (no device): batches/sec and MB/s of batch
assembly at octo_base-shaped records (~786 KB each: 2 frames of
280x280x3 uint8 + action + ids).  The number that matters is whether the
loader can outrun the train step (12.2 ms/step at batch 32 on v5e =
~2.1 GB/s of example bytes); the native reader's margin over that is the
headroom that keeps the input pipeline off the critical path.

Also measures the sharded configuration (shard 0 of 8) — per-host rate
is what a multi-host job sees — and O(1) restore.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_modal_transformers_tokenmerge_tpu.utils.recordio import (  # noqa: E402
    RecordReader,
    write_records,
)

BATCH = 32
N_RECORDS = 512  # fits page cache: measures assembly, not cold disk


def _examples(n):
    rng = np.random.default_rng(0)
    for _ in range(n):
        yield {
            "images": rng.integers(0, 255, (2, 280, 280, 3), np.uint8),
            "actions": rng.normal(size=(8,)).astype(np.float32),
            "text": rng.integers(0, 32000, (16,)).astype(np.int32),
        }


def measure(reader, n_batches=64):
    next(reader)  # warm: memmap/queue spin-up
    t0 = time.perf_counter()
    for _ in range(n_batches):
        b = next(reader)
        b["images"][0, 0]  # touch (views are lazy)
    dt = time.perf_counter() - t0
    bytes_per_batch = reader.record_size * reader.batch_size
    return {
        "batches_per_sec": round(n_batches / dt, 1),
        "examples_per_sec": round(n_batches * reader.batch_size / dt, 1),
        "mb_per_sec": round(n_batches * bytes_per_batch / dt / 1e6, 1),
    }


def main():
    # round 5: the C++ reader moved to examples/native_backends
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "native_backends"))
    from native_recordio import NativeRecordReader

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.rec")
        write_records(path, _examples(N_RECORDS))
        out = {}
        r = NativeRecordReader(path, batch_size=BATCH, shuffle_seed=0,
                               num_threads=4)
        out["native"] = measure(r)
        r.close()
        r = RecordReader(path, batch_size=BATCH, shuffle_seed=0,
                         backend="numpy")
        out["numpy"] = measure(r)
        r.close()
        r = NativeRecordReader(path, batch_size=BATCH, shuffle_seed=0,
                               num_threads=4, shard_id=0, num_shards=8)
        out["native_shard_0_of_8"] = measure(r, n_batches=32)
        r.close()

        t0 = time.perf_counter()
        r = NativeRecordReader(path, batch_size=BATCH,
                               shuffle_seed=0).restore_state(
            {"consumed": 1_000_000})
        out["restore_1M_batches_ms"] = round(
            (time.perf_counter() - t0) * 1e3, 1)
        r.close()

    print(json.dumps({
        "metric": "record_loader_throughput",
        "value": out["native"]["mb_per_sec"],
        "unit": "MB/s (native backend)",
        "vs_baseline": round(out["native"]["mb_per_sec"]
                             / max(out["numpy"]["mb_per_sec"], 1e-9), 2),
        "detail": {"batch": BATCH, "record_bytes": 786528,
                   "host_cpus": os.cpu_count(), **out},
    }))


if __name__ == "__main__":
    main()
