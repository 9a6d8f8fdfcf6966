"""Episode storage + frame-history windowing (utils/episodes.py):
window assembly, episode-start clamping, no cross-episode leakage,
shuffle determinism, and a train-step integration smoke."""

import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.utils.episodes import (
    EpisodeWindowSampler,
    write_episodes,
)

H = W = 4


def _episode(ep_id, length, action_dim=4, text_len=5):
    # pixel value encodes (episode, step) so windows are checkable exactly
    images = np.zeros((length, H, W, 3), np.uint8)
    for s in range(length):
        images[s] = ep_id * 50 + s
    actions = (np.arange(length, dtype=np.float32)[:, None]
               + 100.0 * ep_id + np.zeros(action_dim))
    text = np.full((text_len,), ep_id, np.int32)
    return {"images": images, "actions": actions, "text_ids": text}


@pytest.fixture()
def record_file(tmp_path):
    path = str(tmp_path / "eps.rec")
    lengths = [5, 3, 7]
    n = write_episodes(path, [_episode(i, t)
                              for i, t in enumerate(lengths)])
    assert n == sum(lengths)
    return path, lengths


def test_window_contents_and_clamping(record_file):
    path, lengths = record_file
    total = sum(lengths)
    s = EpisodeWindowSampler(path, batch_size=total, frames=3,
                             shuffle_seed=None)
    batch = next(s)
    assert batch["images"].shape == (total, 3, H, W, 3)
    assert batch["images"].dtype == np.uint8

    # enumerate ground truth step order: episodes back to back
    flat = [(ep, st) for ep, t in enumerate(lengths) for st in range(t)]
    for i, (ep, st) in enumerate(flat):
        # newest frame is the step itself
        assert batch["images"][i, -1, 0, 0, 0] == ep * 50 + st
        # history clamps at the episode start (repeat first frame)
        for f in range(3):
            want_step = max(st - (2 - f), 0)
            assert batch["images"][i, f, 0, 0, 0] == ep * 50 + want_step, (
                i, ep, st, f)
        np.testing.assert_allclose(batch["actions"][i],
                                   st + 100.0 * ep)
        assert (batch["text_ids"][i] == ep).all()


def test_no_cross_episode_leakage(record_file):
    path, lengths = record_file
    # step 0 of episodes 1 and 2: all history frames must be their own
    # first frame, never the previous episode's last frame
    total = sum(lengths)
    s = EpisodeWindowSampler(path, batch_size=total, frames=2)
    batch = next(s)
    starts = np.cumsum([0] + lengths[:-1])
    for ep, i in enumerate(starts):
        assert batch["images"][i, 0, 0, 0, 0] == ep * 50
        assert batch["images"][i, 1, 0, 0, 0] == ep * 50


def test_shuffle_determinism_and_epoch_coverage(record_file):
    path, lengths = record_file
    total = sum(lengths)
    a = EpisodeWindowSampler(path, batch_size=5, frames=2, shuffle_seed=7)
    b = EpisodeWindowSampler(path, batch_size=5, frames=2, shuffle_seed=7)
    seen = []
    for _ in range(a.batches_per_epoch):
        ba, bb = next(a), next(b)
        np.testing.assert_array_equal(ba["images"], bb["images"])
        seen.extend(ba["images"][:, -1, 0, 0, 0].tolist())
    # one epoch covers distinct steps (remainder dropped)
    assert len(seen) == len(set(seen)) == 5 * a.batches_per_epoch <= total


def test_frames_one_matches_flat_steps(record_file):
    path, lengths = record_file
    s = EpisodeWindowSampler(path, batch_size=4, frames=1)
    batch = next(s)
    assert batch["images"].shape == (4, 1, H, W, 3)


def test_train_step_integration(record_file):
    """Windows feed the jitted train step end to end (micro model)."""
    import jax
    import jax.numpy as jnp
    from micro_configs import octo_micro
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
    from multi_modal_transformers_tokenmerge_tpu.train.state import (
        create_train_state,
    )
    from multi_modal_transformers_tokenmerge_tpu.train.steps import (
        make_train_step,
    )
    import optax

    path, _ = record_file
    # micro model: 64x64 single-frame images, 4-token text, 4-dim actions
    cfg = octo_micro()
    model = Octo(cfg)
    sampler = EpisodeWindowSampler(path, batch_size=2, frames=1,
                                   shuffle_seed=0)
    batch = next(sampler)
    # upsample the 4x4 fixture frames to the model's 64x64 input
    images = jnp.asarray(np.repeat(np.repeat(
        batch["images"][:, 0], 16, axis=1), 16, axis=2), jnp.float32)
    text = jnp.asarray(batch["text_ids"][:, :4] % 64)
    actions = jnp.tanh(jnp.asarray(batch["actions"][:, :4]) / 100.0)

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    variables = model.init(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images)
    state = create_train_state(model, variables, optax.adam(1e-3),
                               rngs={"dropout": keys[2],
                                     "patch_encoding": keys[1],
                                     "diffusion": keys[3]})
    step = make_train_step(head="continuous")
    state, loss = step(state, text, images, actions)
    assert np.isfinite(float(loss))


def test_sampler_shards_disjoint_and_cover(record_file):
    """Two shards of one seed: disjoint newest-step sets per epoch whose
    union has 2 * ((15 // 2) // 3) * 3 distinct windows."""
    path, lengths = record_file

    def newest_steps(shard):
        s = EpisodeWindowSampler(path, batch_size=3, frames=1,
                                 shuffle_seed=4, shard_id=shard,
                                 num_shards=2)
        assert s.batches_per_epoch == (sum(lengths) // 2) // 3
        got = []
        for _ in range(s.batches_per_epoch):
            b = next(s)
            # (episode, step) pixel encoding identifies the window
            got.extend(b["images"][:, 0, 0, 0, 0].tolist())
        assert len(set(got)) == len(got)
        return set(got)

    a, b = newest_steps(0), newest_steps(1)
    assert not (a & b)
    assert len(a | b) == 2 * ((sum(lengths) // 2) // 3) * 3


@pytest.mark.parametrize("consumed", [0, 2, 4, 5, 9])
def test_sampler_restore_state_continues(record_file, consumed):
    """batches_per_epoch is 5 here, so consumed spans epoch start,
    mid-epoch, exact boundary, and into epoch 2."""
    path, _ = record_file
    s1 = EpisodeWindowSampler(path, batch_size=3, frames=2, shuffle_seed=8)
    for _ in range(consumed):
        next(s1)
    snap = s1.state()
    want = [next(s1)["images"][:, -1, 0, 0, 0].tolist() for _ in range(4)]

    s2 = EpisodeWindowSampler(path, batch_size=3, frames=2,
                              shuffle_seed=8).restore_state(snap)
    got = [next(s2)["images"][:, -1, 0, 0, 0].tolist() for _ in range(4)]
    assert got == want
    assert s2.state()["consumed"] == consumed + 4
    with pytest.raises(ValueError, match="fresh"):
        s2.restore_state(snap)
