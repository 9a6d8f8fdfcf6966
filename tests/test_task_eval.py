"""Closed-loop scripted task (utils/sim.py): env invariants, expert
ceiling, and the full train->serve->rollout loop on a micro policy.

The on-hardware success-rate artifact lives in benchmarks/task_eval.py
(task_eval_r5.json); these are the fast CPU checks of the same loop.
"""

import sys as _sys
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from micro_configs import octo_micro  # noqa: E402

from multi_modal_transformers_tokenmerge_tpu import Octo  # noqa: E402
from multi_modal_transformers_tokenmerge_tpu.serve.policy import (  # noqa: E402,E501
    PolicyEngine)
from multi_modal_transformers_tokenmerge_tpu.utils.sim import (  # noqa: E402
    COLORS, ReachTask, instruction_ids)


def _task(**kw):
    kw.setdefault("image_size", 64)
    kw.setdefault("action_dim", 4)
    return ReachTask(**kw)


# ------------------------------------------------------------------- env

def test_reset_invariants():
    task = _task()
    rng = np.random.default_rng(0)
    state = task.reset(rng, 16)
    assert state["agent"].shape == (16, 2)
    assert state["blocks"].shape == (16, task.num_blocks, 2)
    # blocks separated, distinct colors per scene, start far from target
    for b in range(16):
        pos = state["blocks"][b]
        d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
        d[np.arange(len(pos)), np.arange(len(pos))] = np.inf
        assert d.min() >= task.min_block_sep
        assert len(set(state["colors"][b].tolist())) == task.num_blocks
    assert (task.distance_to_target(state) >= task.min_start_dist).all()


def test_render_shape_determinism_and_colors():
    task = _task()
    state = task.reset(np.random.default_rng(3), 4)
    img1, img2 = task.render(state), task.render(state)
    assert img1.shape == (4, 64, 64, 3) and img1.dtype == np.uint8
    np.testing.assert_array_equal(img1, img2)
    # the target block's color is present in the frame
    pal = task.palette
    for b in range(4):
        color = np.asarray(
            COLORS[pal[int(state["colors"][b, int(state["target"][b])])]],
            np.uint8)
        assert (img1[b].reshape(-1, 3) == color).all(-1).any()
    # agent (white) is present
    assert (img1[0].reshape(-1, 3) == 255).all(-1).any()


def test_instruction_ids_fixed_and_injective():
    ids = {c: tuple(instruction_ids(c, 8)) for c in COLORS}
    assert len(set(ids.values())) == len(COLORS)
    np.testing.assert_array_equal(instruction_ids("red", 8),
                                  instruction_ids("red", 8))
    assert instruction_ids("red", 16).shape == (16,)
    with pytest.raises(ValueError):
        instruction_ids("red", 2)


def test_expert_closes_the_loop():
    """The scripted expert must reach every target within max_steps."""
    task = _task()
    rng = np.random.default_rng(1)
    state = task.reset(rng, 32)
    done = np.zeros(32, bool)
    for _ in range(task.max_steps):
        state = task.step(state, task.expert_action(state))
        done |= task.succeeded(state)
    assert done.all()
    # expert holds position once inside the radius
    a = task.expert_action(state)
    assert np.abs(a[done]).max() == 0.0


def test_rollout_null_policy_fails_and_latching():
    """A do-nothing policy succeeds nowhere (starts are >= min_start_dist
    from the target); the rollout API returns the expected fields."""
    task = _task(max_steps=6)
    r = task.rollout(lambda obs, text: np.zeros((8, 4), np.float32),
                     np.random.default_rng(2), 8, frames=1)
    assert r["success_rate"] == 0.0
    assert r["episodes"] == 8
    assert np.isnan(r["mean_steps_to_success"])
    assert r["mean_final_distance"] >= task.success_radius


def test_rollout_observation_contract():
    """The rollout feeds (B, F, H, W, 3) uint8 frames + (B, L) int32 ids
    and honors the policy's actions (a policy moving +x increases
    agent x).  uint8 on the wire is deliberate: a float32 obs batch is
    4x the bytes over a remote-device link and patchify normalizes
    uint8/float identically."""
    task = _task()
    seen = {}

    def probe_policy(obs, text):
        seen["obs"] = obs
        seen["text"] = text
        a = np.zeros((4, 4), np.float32)
        a[:, 0] = 1.0  # +x
        return a

    task.rollout(probe_policy, np.random.default_rng(5), 4, frames=2)
    assert seen["obs"].shape == (4, 2, 64, 64, 3)
    assert seen["obs"].dtype == np.uint8
    assert seen["text"].shape == (4, 16) and seen["text"].dtype == np.int32


def test_episodes_roundtrip_through_episode_file(tmp_path):
    """generate_episodes -> write_episodes -> EpisodeWindowSampler yields
    model-shaped batches."""
    from multi_modal_transformers_tokenmerge_tpu.utils.episodes import (
        EpisodeWindowSampler, write_episodes)

    task = _task(episode_len=6)
    path = str(tmp_path / "reach.rec")
    n = write_episodes(path, task.generate_episodes(
        np.random.default_rng(0), 8, text_length=4))
    # episodes trim at success: at most 6 steps each, at least 2 (starts
    # are >= min_start_dist from the target)
    assert 8 * 2 <= n <= 8 * 6
    s = EpisodeWindowSampler(path, batch_size=8, frames=2, shuffle_seed=0)
    batch = next(s)
    assert batch["images"].shape == (8, 2, 64, 64, 3)
    assert batch["actions"].shape == (8, 4)
    assert batch["text_ids"].shape == (8, 4)


# --------------------------------------------------- micro end-to-end

def test_micro_policy_learns_and_rolls_out():
    """The full loop at micro scale: expert data -> diffusion training ->
    PolicyEngine -> closed-loop rollout.  Asserts the training loss
    drops and the engine-driven rollout runs end-to-end; the real
    success-rate numbers are the TPU artifact's job
    (benchmarks/task_eval.py)."""
    import optax

    from multi_modal_transformers_tokenmerge_tpu.train.state import (
        create_train_state)
    from multi_modal_transformers_tokenmerge_tpu.train.steps import (
        make_train_step)

    task = _task(episode_len=6)
    cfg = octo_micro()
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)

    # flat dataset (frames, actions, ids) from 16 expert episodes
    frames, actions, texts = [], [], []
    for ep in task.generate_episodes(np.random.default_rng(7), 16,
                                     text_length=cfg.text.max_length):
        frames.append(ep["images"])
        actions.append(ep["actions"])
        texts.append(np.broadcast_to(
            ep["text_ids"], (ep["images"].shape[0], cfg.text.max_length)))
    frames = np.concatenate(frames).astype(np.float32)
    actions = np.concatenate(actions).astype(np.float32)
    texts = np.concatenate(texts).astype(np.int32)

    variables = model.init(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        texts[:4], frames[:4])
    state = create_train_state(
        model, variables, optax.adamw(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1],
              "diffusion": keys[3]})
    step = make_train_step("diffusion", donate=False)

    rng = np.random.default_rng(0)
    losses = []
    for i in range(60):
        sel = rng.permutation(frames.shape[0])[:16]
        state, loss = step(state, jnp.asarray(texts[sel]),
                           jnp.asarray(frames[sel]),
                           jnp.asarray(actions[sel]))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), (
        "diffusion training did not reduce the loss on the reach task")

    # closed-loop rollout through the serving engine (single frame)
    eng = PolicyEngine(model, {"params": state.params},
                       head="diffusion", batch_size=8,
                       rng=jax.random.PRNGKey(1))

    def policy(obs, text):
        ids = np.minimum(text[:, :cfg.text.max_length],
                         cfg.text.vocab_size - 1)
        return np.asarray(eng(jnp.asarray(obs[:, -1]),
                              text_tokens=jnp.asarray(ids)))

    r = task.rollout(policy, np.random.default_rng(11), 8, frames=1)
    assert set(r) >= {"success_rate", "mean_final_distance",
                      "mean_steps_to_success", "episodes"}
    assert 0.0 <= r["success_rate"] <= 1.0
    assert np.isfinite(r["mean_final_distance"])
