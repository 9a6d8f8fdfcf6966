"""Learnability control for the reach task: tiny spatial-softmax CNN.

The r5 flagship probe on random-state data UNDERFIT (loss ~= label
variance, train cos 0.27): before blaming the data or the task, this
control trains a minimal CoordConv + spatial-softmax CNN — the standard
visuomotor-localization inductive bias — on the EXACT dataset
task_eval.build_dataset produces, and reports holdout cosine and a
closed-loop novel-scene success rate.  If this generalizes, the task
and labels are sound and the flagship's failure is an architecture /
optimization question; if it also fails, the data pipeline is suspect.

Env: CTRL_SAMPLES=3000 CTRL_STEPS=2000 CTRL_BATCH=128 CTRL_LR=1e-3
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

from multi_modal_transformers_tokenmerge_tpu.utils.sim import (  # noqa: E402
    ReachTask)
from task_eval import build_dataset  # noqa: E402

N = int(os.environ.get("CTRL_SAMPLES", "3000"))
STEPS = int(os.environ.get("CTRL_STEPS", "2000"))
BATCH = int(os.environ.get("CTRL_BATCH", "128"))
LR = float(os.environ.get("CTRL_LR", "1e-3"))
EVAL_EPISODES = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class TinyPolicy(nn.Module):
    """CoordConv -> 4 strided convs -> spatial softmax -> MLP, colored
    instruction as a learned embedding concatenated at the trunk."""
    features: int = 32

    @nn.compact
    def __call__(self, img, color_id):
        # img (B, H, W, 3) float in [0,1]; coord channels
        b, h, w, _ = img.shape
        yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, h),
                              jnp.linspace(-1, 1, w), indexing="ij")
        coords = jnp.broadcast_to(
            jnp.stack([yy, xx], -1)[None], (b, h, w, 2))
        x = jnp.concatenate([img, coords], -1)
        for i, (f, k, s) in enumerate(((16, 5, 2), (32, 3, 2),
                                       (self.features, 3, 2),
                                       (self.features, 3, 2))):
            x = nn.Conv(f, (k, k), strides=(s, s), name=f"conv{i}")(x)
            x = nn.relu(x)
        # spatial softmax: per-channel expected (y, x)
        bb, hh, ww, cc = x.shape
        flat = x.reshape(bb, hh * ww, cc)
        attn = jax.nn.softmax(flat, axis=1)
        gy, gx = jnp.meshgrid(jnp.linspace(-1, 1, hh),
                              jnp.linspace(-1, 1, ww), indexing="ij")
        grid = jnp.stack([gy.ravel(), gx.ravel()], -1)      # (HW, 2)
        keypoints = jnp.einsum("bpc,pk->bck", attn, grid)   # (B, C, 2)
        emb = nn.Embed(16, 16, name="color")(color_id)      # (B, 16)
        z = jnp.concatenate([keypoints.reshape(bb, -1), emb], -1)
        z = nn.relu(nn.Dense(128)(z))
        z = nn.relu(nn.Dense(128)(z))
        return nn.Dense(2)(z)


def main():
    task = ReachTask()
    t0 = time.time()
    frames, window, actions, text, _ = build_dataset(task, N, seed=42)
    hf, hw, ha, ht, _ = build_dataset(task, 128, seed=424242)
    log(f"[ctrl] data {frames.shape} in {time.time() - t0:.0f}s")
    # control uses the LAST frame only
    cur = window[:, -1]
    color = text[:, 2].astype(np.int32)
    hcolor = ht[:, 2].astype(np.int32)

    model = TinyPolicy()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 280, 280, 3)), jnp.zeros((1,), jnp.int32))
    tx = optax.adam(LR)
    opt = tx.init(params)

    frames_d = jnp.asarray(frames)
    cur_d = jnp.asarray(cur)
    col_d = jnp.asarray(color)
    act_d = jnp.asarray(actions[:, :2])
    rng = np.random.default_rng(7)
    sel = np.stack([rng.permutation(cur.shape[0])[:BATCH]
                    for _ in range(STEPS)]).astype(np.int32)
    sel_d = jnp.asarray(sel)

    def loss_fn(p, img, col, a):
        pred = model.apply(p, img, col)
        return jnp.mean(jnp.sum((pred - a) ** 2, -1))

    # big arrays are jit ARGUMENTS — closed-over tensors become consts
    # serialized into the remote-compile HTTP request (413 over ~100MB)
    @jax.jit
    def segment(params, opt, start, n, frames_d, cur_d, act_d, col_d,
                sel_d):
        def body(i, carry):
            params, opt, acc = carry
            ids = jax.lax.dynamic_index_in_dim(sel_d, start + i,
                                               keepdims=False)
            img = jnp.take(frames_d, jnp.take(cur_d, ids), axis=0
                           ).astype(jnp.float32) / 255.0
            a = jnp.take(act_d, ids, axis=0)
            c = jnp.take(col_d, ids, axis=0)
            loss, g = jax.value_and_grad(loss_fn)(params, img, c, a)
            upd, opt = tx.update(g, opt, params)
            params = optax.apply_updates(params, upd)
            return params, opt, acc + loss
        params, opt, acc = jax.lax.fori_loop(
            0, n, body, (params, opt, jnp.float32(0.0)))
        return params, opt, acc / n

    segs = 10
    for s in range(segs):
        params, opt, ml = segment(params, opt,
                                  jnp.int32(s * (STEPS // segs)),
                                  jnp.int32(STEPS // segs),
                                  frames_d, cur_d, act_d, col_d, sel_d)
        log(f"[ctrl] seg {s + 1}/{segs} loss {float(ml):.4f} "
            f"[{time.time() - t0:.0f}s]")

    @jax.jit
    def predict(params, img, col):
        return model.apply(params, img, col)

    def cosine(pred, a):
        num = np.sum(pred * a[:, :2], 1)
        den = (np.linalg.norm(pred, axis=1)
               * np.linalg.norm(a[:, :2], axis=1) + 1e-8)
        return float(np.mean(num / den))

    himg = hf[hw[:, -1]].astype(np.float32) / 255.0
    hpred = np.asarray(predict(params, jnp.asarray(himg), jnp.asarray(hcolor)))
    hold_cos = cosine(hpred, ha)
    log(f"[ctrl] holdout cos {hold_cos:.4f} "
        f"mae {np.abs(hpred - ha[:, :2]).mean():.4f}")

    # closed-loop on novel scenes (policy sees only the last frame)
    def policy(obs, txt):
        img = jnp.asarray(obs[:, -1] / 255.0)
        col = jnp.asarray(txt[:, 2].astype(np.int32))
        xy = np.asarray(predict(params, img, col))
        out = np.zeros((obs.shape[0], task.action_dim), np.float32)
        out[:, :2] = xy
        return out

    r = task.rollout(policy, np.random.default_rng(9090), EVAL_EPISODES,
                     frames=2)
    log(f"[ctrl] closed-loop novel: {r}")
    print(json.dumps({"holdout_cos": round(hold_cos, 4),
                      "novel_success": r["success_rate"],
                      "mean_final_distance": r["mean_final_distance"],
                      "samples": N, "steps": STEPS}))


if __name__ == "__main__":
    main()
