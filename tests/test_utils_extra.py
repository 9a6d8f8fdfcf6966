"""Tests: data prefetching, ball query, MAP-pooled head, distributed
helpers, logging, CLI."""

import json
import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.modules.pointcloud import (
    ball_query,
    pairwise_sq_dist,
)
from multi_modal_transformers_tokenmerge_tpu.modules.text import WordTokenizer
from multi_modal_transformers_tokenmerge_tpu.parallel.distributed import (
    is_multihost,
    process_info,
)
from multi_modal_transformers_tokenmerge_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
)
from multi_modal_transformers_tokenmerge_tpu.utils.data import (
    prefetch_to_device,
    synthetic_octo_batches,
)
from multi_modal_transformers_tokenmerge_tpu.utils.logging import MetricLogger
def test_prefetch_to_device_order_and_placement():
    batches = [(np.full((4, 2), i, np.float32),) for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, (x,) in enumerate(out):
        assert isinstance(x, jax.Array)
        assert float(x[0, 0]) == i


def test_prefetch_to_device_zero_size():
    """size=0 means no lookahead — batches must still flow (a review
    finding: the queue-primed loop silently yielded nothing)."""
    batches = [(np.full((4, 2), i, np.float32),) for i in range(3)]
    out = list(prefetch_to_device(iter(batches), size=0))
    assert len(out) == 3
    for i, (x,) in enumerate(out):
        assert isinstance(x, jax.Array)
        assert float(x[0, 0]) == i


def test_prefetch_with_sharding():
    mesh = make_mesh(data=8, model=1)
    bs = batch_sharding(mesh)
    batches = [(np.zeros((8, 3), np.float32),) for _ in range(3)]
    out = list(prefetch_to_device(iter(batches), size=2, sharding=bs))
    assert out[0][0].sharding.is_equivalent_to(bs, 2)


def test_synthetic_batches_shapes():
    it = synthetic_octo_batches(4, image_shape=(2, 8, 8, 3), text_length=5,
                                action_dim=3)
    text, images, actions = next(it)
    assert text.shape == (4, 5) and text.dtype == np.int32
    assert images.shape == (4, 2, 8, 8, 3)
    assert actions.shape == (4, 3)


def test_ball_query_radius_semantics():
    pts = jnp.asarray(np.array([[0, 0, 0], [0.1, 0, 0], [5, 0, 0],
                                [0.2, 0, 0]], np.float32))
    centroids = pts[:1]
    idx = np.asarray(ball_query(pts, centroids, k=3, radius=1.0))
    # the far point (index 2) must not appear; short balls pad w/ nearest
    assert 2 not in idx[0]
    assert set(idx[0]).issubset({0, 1, 3})


def test_map_pooled_continuous_head():
    from multi_modal_transformers_tokenmerge_tpu.core.config import (
        ContinuousHeadConfig)
    from multi_modal_transformers_tokenmerge_tpu.heads.continuous import (
        ContinuousActionHead)
    cfg = ContinuousHeadConfig(max_action=1.0, action_space_dim=4,
                               pooling="map", map_num_heads=2)
    head = ContinuousActionHead(cfg)
    readouts = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 16))
    v = head.init(jax.random.PRNGKey(1), readouts)
    out = head.apply(v, readouts)
    assert out.shape == (2, 1, 4)
    assert np.abs(np.asarray(out)).max() <= 1.0


def test_distributed_helpers_single_process():
    assert not is_multihost()
    info = process_info()
    assert info["process_count"] == 1
    assert info["global_device_count"] == 8


def test_metric_logger_jsonl(tmp_path):
    path = tmp_path / "log.jsonl"
    logger = MetricLogger(jsonl_path=str(path))
    logger.log({"loss": 1.5}, step=3)
    logger.log({"loss": 1.2}, step=4)
    logger.close()
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 3
    assert lines[1]["step"] == 4


def test_time_fn_harness():
    from multi_modal_transformers_tokenmerge_tpu.utils.profiling import time_fn
    import jax.numpy as jnp
    f = jax.jit(lambda x: x * 2)
    stats = time_fn(f, jnp.ones((8, 8)), iters=5, warmup=1)
    assert set(stats) >= {"p50", "p90", "p99", "mean"}
    assert stats["p50"] > 0 and stats["p99"] >= stats["p50"]


def test_cli_data_subcommand(tmp_path, capsys):
    """`python -m ... data file.rec` reports records/schema/compatibility."""
    import json

    import numpy as np

    from multi_modal_transformers_tokenmerge_tpu.__main__ import main
    from multi_modal_transformers_tokenmerge_tpu.utils.recordio import (
        write_records)

    a = str(tmp_path / "a.rec")
    b = str(tmp_path / "b.rec")
    write_records(a, ({"x": np.zeros((2,), np.float32)} for _ in range(5)))
    write_records(b, ({"y": np.zeros((3,), np.int32)} for _ in range(7)))
    assert main(["data", a, b]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["total_records"] == 12
    assert out["files"][0]["compatible_with_first"] is True
    assert out["files"][1]["compatible_with_first"] is False
    assert out["schema"] == [{"field": "x", "shape": [2],
                              "dtype": "float32"}]
    assert out["is_episode_file"] is False
    assert main(["data"]) == 2


def test_bench_compact_line_fits_capture_window():
    """The driver records only the output tail; bench.py's final line must
    stay self-contained under ~2 KB for every recorded payload shape."""
    import importlib.util
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(root, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    rec = os.path.join(root, "benchmarks", "recorded")
    checked = 0
    for name in sorted(os.listdir(rec)):
        if not name.endswith(".json") or name == "LATEST.json":
            continue
        try:
            with open(os.path.join(rec, name)) as f:
                payload = json.load(f)
        except ValueError:
            continue
        if "metric" not in payload:
            continue
        line = bench.compact_line(payload, name)
        assert len(line) <= 2000, (name, len(line))
        parsed = json.loads(line)
        assert parsed["metric"] == payload["metric"]
        checked += 1
    assert checked >= 10  # the recorded corpus is non-trivial
