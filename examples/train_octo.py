"""Train an OCTO policy end-to-end (synthetic data).

Usage:
    python examples/train_octo.py [--preset octo_tiny] [--head continuous]
        [--steps 200] [--batch 8] [--data-parallel] [--ckpt DIR]
        [--recordio FILE]

Covers the full training path: config -> model init -> optimizer with
warmup-cosine + clipping -> prefetched data -> jitted donated train steps
(optionally data-parallel over all local devices) -> metrics -> orbax
checkpointing.  ``--recordio FILE`` writes a synthetic dataset to FILE on
first use and streams batches through the memmap record loader
(utils/recordio.py) instead of generating them in Python per step.
"""

import argparse
import itertools
import os

import jax
import jax.numpy as jnp

from multi_modal_transformers_tokenmerge_tpu import (
    Octo, create_train_state, fit, get_preset)
from multi_modal_transformers_tokenmerge_tpu.parallel.mesh import (
    batch_sharding, make_mesh)
from multi_modal_transformers_tokenmerge_tpu.train.checkpoint import (
    CheckpointManager)
from multi_modal_transformers_tokenmerge_tpu.train.loop import graceful_stop
from multi_modal_transformers_tokenmerge_tpu.train.optim import make_optimizer
from multi_modal_transformers_tokenmerge_tpu.utils.data import (
    prefetch_to_device, synthetic_octo_batches)
from multi_modal_transformers_tokenmerge_tpu.utils.logging import MetricLogger


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="octo_tiny")
    p.add_argument("--head", default="continuous",
                   choices=["continuous", "categorical", "diffusion"])
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--data-parallel", action="store_true")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint in --ckpt (train "
                        "state AND data-stream position for --recordio) "
                        "and run --steps more steps")
    p.add_argument("--cached-text", action="store_true",
                   help="precompute the frozen text tower's embeddings per "
                        "distinct instruction and train on them (requires "
                        "a t5-kind frozen text tower; skips ~20%% of the "
                        "forward every step)")
    p.add_argument("--recordio", default=None, metavar="FILE",
                   help="stream batches from FILE via the record "
                        "loader (synthetic data written there on first use)")
    p.add_argument("--shards", type=int, default=None,
                   help="shard the record stream across N hosts (default: "
                        "jax.process_count()); this process reads shard "
                        "--shard-id (default: jax.process_index())")
    p.add_argument("--shard-id", type=int, default=None)
    p.add_argument("--episodes", default=None, metavar="FILE",
                   help="stream frame-history windows from an EPISODE "
                        "file (utils/episodes.py; synthetic episodes "
                        "written there on first use)")
    args = p.parse_args()

    cfg = get_preset(args.preset)
    model = Octo(cfg)
    head_cfg = getattr(cfg.heads, args.head)
    if head_cfg is None:
        raise SystemExit(f"preset {args.preset} has no {args.head} head")

    img_cfg = cfg.images
    frames = cfg.num_observation_blocks
    image_shape = ((frames, *img_cfg.image_size) if frames > 1
                   else img_cfg.image_size)

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    sample_text = jnp.ones((args.batch, cfg.text.max_length), jnp.int32)
    sample_images = jnp.zeros((args.batch, *image_shape))
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        sample_text, sample_images)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(f"{args.preset}: {n_params / 1e6:.1f}M params, head={args.head}")

    # frozen t5 tower carries no optimizer state/traffic (embed-kind text
    # towers are trainable, so freezing is keyed on the config)
    frozen = ("text_encoder",) if cfg.text.kind == "t5" else ()
    tx = make_optimizer(peak_lr=3e-4, warmup_steps=20,
                        total_steps=args.steps,
                        params=variables["params"],
                        frozen_prefixes=frozen)
    rngs = {"dropout": keys[2], "patch_encoding": keys[1]}
    if args.head == "diffusion":
        rngs["diffusion"] = keys[3]
    state = create_train_state(model, variables, tx, rngs=rngs)

    ckpt = CheckpointManager(args.ckpt) if args.ckpt else None
    resume_step = None
    if ckpt is not None and args.resume:
        resume_step = ckpt.latest_step()
        if resume_step is not None:
            restored = ckpt.restore(abstract_state=jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state))
            # apply_fn/tx are code, not data — keep the live ones
            state = restored.replace(apply_fn=state.apply_fn, tx=state.tx)
            print(f"resumed train state from step {resume_step}")

    mesh = None
    sharding = None
    if args.data_parallel:
        mesh = make_mesh(model=1)
        sharding = batch_sharding(mesh)
        print(f"data-parallel over {mesh.shape} devices")

    data_state_fn = None
    if args.episodes:
        import numpy as np

        from multi_modal_transformers_tokenmerge_tpu.utils.episodes import (
            EpisodeWindowSampler, write_episodes)
        if not os.path.exists(args.episodes):
            rng = np.random.default_rng(0)
            n_eps, written = max(args.batch, 16), 0

            def eps():
                nonlocal written
                for _ in range(n_eps):
                    t = int(rng.integers(6, 14))
                    written += t
                    yield {
                        "images": rng.integers(
                            0, 255, (t, *img_cfg.image_size), np.uint8),
                        "actions": rng.normal(
                            0, 0.3, (t, head_cfg.action_space_dim)
                        ).astype(np.float32),
                        "text_ids": rng.integers(
                            0, cfg.text.vocab_size,
                            (cfg.text.max_length,)).astype(np.int32),
                    }

            write_episodes(args.episodes, eps())
            print(f"wrote {n_eps} synthetic episodes ({written} steps) "
                  f"to {args.episodes}")
        sampler = EpisodeWindowSampler(args.episodes, args.batch,
                                       frames=frames, shuffle_seed=0)
        print(f"episode windows: {sampler.num_steps} steps, "
              f"{frames}-frame history")
        if resume_step is not None:
            ds = ckpt.restore_data_state(resume_step)
            if ds is not None:
                sampler.restore_state(ds)
                print(f"resumed episode stream at batch {ds['consumed']}")
        data_state_fn = sampler.state

        def episode_batches():
            for b in sampler:
                img = b["images"].astype(np.float32)
                if frames == 1:
                    img = img[:, 0]
                yield (b["text_ids"].astype(np.int32), img, b["actions"])

        batches = episode_batches()
    elif args.recordio:
        from multi_modal_transformers_tokenmerge_tpu.utils.recordio import (
            RecordReader, write_records)
        if not os.path.exists(args.recordio):
            n = max(4 * args.batch, 64)
            examples = (
                {"text": t[0], "images": im[0], "actions": a[0]}
                for t, im, a in itertools.islice(
                    synthetic_octo_batches(
                        1, image_shape=image_shape,
                        text_length=cfg.text.max_length,
                        action_dim=head_cfg.action_space_dim,
                        vocab_size=cfg.text.vocab_size), n))
            wrote = write_records(args.recordio, examples)
            print(f"wrote {wrote} synthetic records to {args.recordio}")
        num_shards = args.shards or jax.process_count()
        shard_id = (args.shard_id if args.shard_id is not None
                    else jax.process_index())
        reader = RecordReader(args.recordio, batch_size=args.batch,
                              shuffle_seed=0, shard_id=shard_id,
                              num_shards=num_shards)
        print(f"record loader: backend={reader.backend}, "
              f"{reader.num_records} records"
              + (f", shard {shard_id}/{num_shards}"
                 if num_shards > 1 else ""))
        if resume_step is not None:
            ds = ckpt.restore_data_state(resume_step)
            if ds is not None:
                reader.restore_state(ds)
                print(f"resumed data stream at batch {ds['consumed']}")
        data_state_fn = reader.state
        batches = (
            (b["text"], b["images"], b["actions"]) for b in reader)
    else:
        batches = synthetic_octo_batches(
            args.batch, image_shape=image_shape,
            text_length=cfg.text.max_length,
            action_dim=head_cfg.action_space_dim,
            vocab_size=cfg.text.vocab_size)

    if args.cached_text:
        from multi_modal_transformers_tokenmerge_tpu.utils.data import (
            cache_text_embeddings)
        # the train step donates the state, invalidating the buffers that
        # went into it — the lazy encoder needs its OWN copy of the
        # (frozen) text tower
        text_vars = {"params": {"text_encoder": jax.tree.map(
            jnp.array, variables["params"]["text_encoder"])}}
        batches = cache_text_embeddings(batches, model, text_vars)
        print("cached-text training: frozen tower runs once per "
              "distinct instruction")

    data = prefetch_to_device(batches, size=2, sharding=sharding)

    logger = MetricLogger()
    # SIGTERM/SIGINT (pod preemption, ctrl-C) checkpoints and exits
    # cleanly; restart with --resume to continue
    state = fit(state, data, head=args.head, num_steps=args.steps,
                mesh=mesh, logger=logger, log_every=25,
                checkpointer=ckpt, checkpoint_every=100,
                text_input="embeddings" if args.cached_text else "ids",
                data_state_fn=data_state_fn,
                should_stop=graceful_stop() if ckpt else None)
    print("final:", jax.device_get(state.metrics.compute()))


if __name__ == "__main__":
    main()
