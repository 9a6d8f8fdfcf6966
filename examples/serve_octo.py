"""Serve an OCTO policy: AOT compile, cache the instruction, run a
micro-batched request loop.

Usage:
    python examples/serve_octo.py [--preset octo_tiny] [--head continuous]
        [--batch 4] [--requests 16]
"""

import argparse
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_transformers_tokenmerge_tpu import Octo, get_preset
from multi_modal_transformers_tokenmerge_tpu.modules.text import WordTokenizer
from multi_modal_transformers_tokenmerge_tpu.serve.policy import PolicyEngine
from multi_modal_transformers_tokenmerge_tpu.serve.server import PolicyServer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="octo_tiny")
    p.add_argument("--head", default="continuous")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--requests", type=int, default=16)
    p.add_argument("--image-tower", default="bf16",
                   choices=["bf16", "int8", "w8"],
                   help="PTQ patch embedder (serve/quantize.py): 'w8' "
                        "weight-only int8 for batch-1 latency, 'int8' "
                        "(activations too) for footprint at batch")
    p.add_argument("--text-tower", default="bf16",
                   choices=["bf16", "int8", "w8"],
                   help="PTQ frozen T5 instruction encoder — pays for "
                        "uncached-instruction b1 serving ('w8' is the "
                        "b1 recommendation; t5 presets only; BASELINE.md "
                        "regime table)")
    p.add_argument("--ddim-steps", type=int, default=None,
                   help="serve with S-step deterministic DDIM instead of "
                        "the full DDPM reverse loop; requires "
                        "--head diffusion (and a preset with a diffusion "
                        "head, e.g. --preset octo_base)")
    args = p.parse_args()
    if args.ddim_steps is not None and args.head != "diffusion":
        p.error("--ddim-steps requires --head diffusion")

    cfg = get_preset(args.preset)
    model = Octo(cfg)
    frames = cfg.num_observation_blocks
    image_shape = ((frames, *cfg.images.image_size) if frames > 1
                   else cfg.images.image_size)

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text_shape = (cfg.text.max_length,)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        jnp.ones((args.batch, *text_shape), jnp.int32),
        jnp.zeros((args.batch, *image_shape)))

    engine = PolicyEngine(model, variables, head=args.head,
                          batch_size=args.batch,
                          image_tower=args.image_tower,
                          text_tower=args.text_tower,
                          ddim_steps=args.ddim_steps)
    t0 = time.time()
    engine.compile(text_shape, image_shape)
    print(f"AOT compile: {time.time() - t0:.1f}s")

    tok = WordTokenizer.from_corpus(
        ["pick up the red block and place it on the green block"],
        max_length=cfg.text.max_length)
    instruction = np.repeat(tok(["pick up the red block"]), args.batch, 0)
    engine.set_instruction(jnp.asarray(instruction))
    print("instruction cached (text tower will not run again)")

    rng = np.random.default_rng(0)
    with PolicyServer(engine, max_wait_ms=2.0) as server:
        results = [None] * args.requests
        errors = []

        def call(i):
            obs = rng.uniform(0, 255, image_shape).astype(np.float32)
            t = time.perf_counter()
            try:
                results[i] = (server.predict(obs), time.perf_counter() - t)
            except Exception as e:  # surface it, don't die in the thread
                errors.append((i, e))

        t0 = time.time()
        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(args.requests)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        wall = time.time() - t0

    if errors:
        i, e = errors[0]
        raise RuntimeError(
            f"{len(errors)}/{args.requests} requests failed "
            f"(first: request {i})") from e
    lats = sorted(r[1] for r in results)
    print(f"{args.requests} requests in {wall * 1e3:.0f}ms "
          f"(p50 latency {lats[len(lats) // 2] * 1e3:.1f}ms); "
          f"sample action: {np.asarray(results[0][0]).ravel()[:4].round(3)}")


if __name__ == "__main__":
    main()
