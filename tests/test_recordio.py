"""Record loader: format round-trip, epoch coverage, sharding, and
train-pipeline integration for the numpy memmap reader (the one supported
backend — the C++ threaded reader was demoted to
examples/native_backends/ in round 5, VERDICT r4 item 6)."""

import os

import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.utils.recordio import (
    RecordReader,
    record_schema_of,
    write_records,
)

N, B = 37, 8


def _examples(n):
    for i in range(n):
        yield {
            "images": np.full((4, 4, 3), i, dtype=np.uint8),
            "actions": np.full((4,), i * 0.5, dtype=np.float32),
            "text": np.full((3,), i, dtype=np.int32),
        }


@pytest.fixture(scope="module")
def record_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rio") / "train.rec")
    wrote = write_records(path, _examples(N))
    assert wrote == N
    return path


def test_header_and_schema(record_file):
    r = RecordReader(record_file, batch_size=B, backend="numpy")
    assert r.num_records == N
    assert r.schema == record_schema_of(next(_examples(1)))
    assert r.batches_per_epoch == N // B


def test_native_backend_removed_raises(record_file):
    """backend='native' must fail loudly with a pointer to the example,
    not silently fall back."""
    with pytest.raises(ValueError, match="native_backends"):
        RecordReader(record_file, batch_size=B, backend="native")
    with pytest.raises(ValueError, match="unknown backend"):
        RecordReader(record_file, batch_size=B, backend="bogus")


def test_sequential_batches_cover_epoch_in_order(record_file):
    r = RecordReader(record_file, batch_size=B)
    seen = []
    for _ in range(r.batches_per_epoch):
        batch = next(r)
        assert batch["images"].shape == (B, 4, 4, 3)
        assert batch["actions"].dtype == np.float32
        # record id is encoded in every field value
        ids = batch["text"][:, 0].tolist()
        assert (batch["images"][:, 0, 0, 0].astype(np.int64).tolist()
                == ids)
        np.testing.assert_allclose(batch["actions"][:, 0],
                                   np.asarray(ids) * 0.5)
        seen.extend(ids)
    assert seen == list(range(r.batches_per_epoch * B))  # in order, no dups
    r.close()


def test_shuffled_epoch_is_a_permutation(record_file):
    r = RecordReader(record_file, batch_size=B, shuffle_seed=7)
    epoch1 = []
    for _ in range(r.batches_per_epoch):
        epoch1.extend(next(r)["text"][:, 0].tolist())
    # distinct records within the epoch, and actually shuffled
    assert len(set(epoch1)) == len(epoch1)
    assert epoch1 != sorted(epoch1)
    # next epoch reshuffles
    epoch2 = []
    for _ in range(r.batches_per_epoch):
        epoch2.extend(next(r)["text"][:, 0].tolist())
    assert len(set(epoch2)) == len(epoch2)
    assert epoch1 != epoch2
    r.close()


def test_reader_feeds_device_prefetch(record_file):
    """Reader -> prefetch_to_device -> jitted consumer."""
    import jax
    import jax.numpy as jnp

    from multi_modal_transformers_tokenmerge_tpu.utils.data import (
        prefetch_to_device)

    r = RecordReader(record_file, batch_size=B, shuffle_seed=3)
    stream = prefetch_to_device(iter(r), size=2)

    @jax.jit
    def consume(batch):
        return (jnp.sum(batch["actions"])
                + jnp.sum(batch["images"].astype(jnp.float32)))

    totals = [float(consume(next(stream))) for _ in range(6)]
    assert all(np.isfinite(t) for t in totals)
    r.close()


def test_writer_rejects_shape_drift(tmp_path):
    bad = [{"a": np.zeros((2,), np.float32)},
           {"a": np.zeros((3,), np.float32)}]
    with pytest.raises(ValueError, match="shape"):
        write_records(str(tmp_path / "bad.rec"), bad)


def test_reader_raises_on_truncated_file(tmp_path):
    """A truncated record file must raise when the damaged batch is
    assembled, not return short/garbage data."""
    path = str(tmp_path / "trunc.rec")
    write_records(path, _examples(24))
    size = os.path.getsize(path)
    with open(path, "r+b") as f:
        f.truncate(size - 100)  # chop into the last records
    r = RecordReader(path, batch_size=8)
    with pytest.raises(Exception):
        for _ in range(r.batches_per_epoch):
            next(r)
    r.close()


@pytest.mark.parametrize("consumed", [0, 3, 4, 7, 9])
def test_restore_state_continues_stream(record_file, consumed):
    """Mid-epoch resume: a fresh reader fast-forwarded to state() must
    yield exactly the batches the original reader would have yielded next
    (consumed spans: epoch start, mid-epoch, exact epoch boundary, and
    into epoch 2+; batches_per_epoch here is 4)."""
    r1 = RecordReader(record_file, batch_size=B, shuffle_seed=11)
    for _ in range(consumed):
        next(r1)
    snap = r1.state()
    want = [next(r1)["text"][:, 0].tolist() for _ in range(5)]
    r1.close()

    r2 = RecordReader(record_file, batch_size=B,
                      shuffle_seed=11).restore_state(snap)
    got = [next(r2)["text"][:, 0].tolist() for _ in range(5)]
    assert got == want
    assert r2.state()["consumed"] == consumed + 5
    r2.close()


def test_restore_state_requires_fresh_reader(record_file):
    r = RecordReader(record_file, batch_size=B)
    next(r)
    with pytest.raises(ValueError, match="fresh"):
        r.restore_state({"consumed": 0})
    r.close()


@pytest.fixture(scope="module")
def multi_files(tmp_path_factory):
    """Three parts of one dataset (sizes 10/7/20); record value == its
    global concatenated index, so file routing errors are visible."""
    d = tmp_path_factory.mktemp("rio_multi")
    sizes, paths, start = [10, 7, 20], [], 0
    for j, n in enumerate(sizes):
        p = str(d / f"part{j}.rec")
        write_records(p, ({"text": np.full((3,), start + i, np.int32),
                           "actions": np.zeros((4,), np.float32),
                           "images": np.zeros((4, 4, 3), np.uint8)}
                          for i in range(n)))
        paths.append(p)
        start += n
    return paths


def test_multi_file_epoch_covers_concatenated_records(multi_files):
    r = RecordReader(multi_files, batch_size=6, shuffle_seed=3)
    assert r.num_records == 37
    seen = []
    for _ in range(r.batches_per_epoch):
        seen.extend(next(r)["text"][:, 0].tolist())
    # distinct records drawn from the full concatenated index space,
    # crossing every file boundary
    assert len(set(seen)) == len(seen)
    assert any(v < 10 for v in seen) and any(v >= 17 for v in seen)
    assert all(0 <= v < 37 for v in seen)
    r.close()


def test_sharded_readers_are_disjoint_and_cover(multi_files):
    """Two shards of the same seed: per-epoch record sets are disjoint,
    and their union is 2 * (37 // 2 // 6 * 6) distinct records."""
    per_epoch = {}
    for shard in (0, 1):
        r = RecordReader(multi_files, batch_size=6, shuffle_seed=9,
                         shard_id=shard, num_shards=2)
        assert r.batches_per_epoch == (37 // 2) // 6
        got = []
        for _ in range(r.batches_per_epoch):
            got.extend(next(r)["text"][:, 0].tolist())
        per_epoch[shard] = set(got)
        assert len(per_epoch[shard]) == len(got)
        r.close()
    assert not (per_epoch[0] & per_epoch[1])
    assert len(per_epoch[0] | per_epoch[1]) == 2 * ((37 // 2) // 6) * 6


def test_sharded_restore_state(multi_files):
    r1 = RecordReader(multi_files, batch_size=4, shuffle_seed=2,
                      shard_id=1, num_shards=2)
    for _ in range(5):
        next(r1)
    snap = r1.state()
    want = [next(r1)["text"][:, 0].tolist() for _ in range(4)]
    r1.close()
    r2 = RecordReader(multi_files, batch_size=4, shuffle_seed=2,
                      shard_id=1, num_shards=2).restore_state(snap)
    got = [next(r2)["text"][:, 0].tolist() for _ in range(4)]
    assert got == want
    r2.close()


def test_multi_file_schema_mismatch_raises(multi_files, tmp_path):
    bad = str(tmp_path / "bad.rec")
    write_records(bad, ({"other": np.zeros((2,), np.float32)}
                        for _ in range(4)))
    with pytest.raises(ValueError, match="schema"):
        RecordReader(multi_files + [bad], batch_size=4)


def test_shard_args_validated(record_file):
    with pytest.raises(ValueError, match="shard_id"):
        RecordReader(record_file, batch_size=4, shard_id=2, num_shards=2)
    with pytest.raises(ValueError, match="batch_size"):
        # 37 // 8 shards = 4 records/shard < batch 8
        RecordReader(record_file, batch_size=8, num_shards=8)


def test_restore_state_is_o1_for_huge_consumed(record_file):
    """restore_state fast-forwards without reading: restoring a position
    tens of thousands of batches deep must be near-instant and exact."""
    import time

    consumed = 50_000  # ~12.5k epochs of this fixture
    r1 = RecordReader(record_file, batch_size=B, shuffle_seed=13)
    t0 = time.perf_counter()
    r1.restore_state({"consumed": consumed})
    elapsed = time.perf_counter() - t0
    assert elapsed < 2.0, f"restore took {elapsed:.2f}s — not O(1)"
    got = [next(r1)["text"][:, 0].tolist() for _ in range(3)]
    r1.close()

    # exactness: check against a second reader that reaches the same
    # position by a smaller skip + real reads
    r2 = RecordReader(record_file, batch_size=B, shuffle_seed=13)
    r2.restore_state({"consumed": consumed - 2})
    next(r2), next(r2)
    want = [next(r2)["text"][:, 0].tolist() for _ in range(3)]
    assert got == want
    r2.close()


@pytest.mark.slow
def test_shard_invariants_fuzz(tmp_path):
    """Property fuzz over the epoch permutation: for random (file split,
    batch size, shard count, seed), every epoch's shard streams are (a)
    in-range, (b) duplicate-free, (c) mutually disjoint, (d) exactly
    span//batch*batch records each, and (e) reproducible given the
    seed."""
    rng = np.random.default_rng(0xF00D)
    for case in range(6):
        n_files = int(rng.integers(1, 4))
        sizes = [int(rng.integers(5, 40)) for _ in range(n_files)]
        total = sum(sizes)
        paths, start = [], 0
        for j, n in enumerate(sizes):
            p = str(tmp_path / f"f{case}_{j}.rec")
            write_records(p, ({"v": np.full((1,), start + i, np.int64)}
                              for i in range(n)))
            paths.append(p)
            start += n
        num_shards = int(rng.integers(1, 4))
        span = total // num_shards
        batch = int(rng.integers(1, max(span, 2)))
        if batch > span:
            continue
        seed = int(rng.integers(0, 2**31))

        def epoch_stream(shard, epochs=2):
            r = RecordReader(paths, batch_size=batch, shuffle_seed=seed,
                             shard_id=shard, num_shards=num_shards)
            out = [[] for _ in range(epochs)]
            for e in range(epochs):
                for _ in range(r.batches_per_epoch):
                    out[e].extend(next(r)["v"][:, 0].tolist())
            r.close()
            return out

        streams = [epoch_stream(s) for s in range(num_shards)]
        for e in range(2):
            all_recs = []
            for s in range(num_shards):
                recs = streams[s][e]
                assert len(recs) == (span // batch) * batch
                assert all(0 <= v < total for v in recs)
                assert len(set(recs)) == len(recs), (case, s, e)
                all_recs.extend(recs)
            assert len(set(all_recs)) == len(all_recs), (case, e)
        # same seed -> identical stream
        assert epoch_stream(0) == streams[0]


def test_closed_reader_raises_not_restart(record_file):
    """A closed reader must stop (prefetch threads drain after cleanup),
    not re-open memmaps and re-serve epoch 0."""
    r = RecordReader(record_file, batch_size=B, shuffle_seed=1)
    next(r)
    r.close()
    with pytest.raises(StopIteration):
        next(r)


def test_write_records_empty_without_schema_raises(tmp_path):
    with pytest.raises(ValueError, match="no examples"):
        write_records(str(tmp_path / "e.rec"), [])
