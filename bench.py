"""Benchmark: obs->action inferences/sec/chip at OCTO-Base (diffusion head).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference architecture executed the reference way — float32,
vanilla attention, whole-method jit.  (The reference itself cannot run in
this image: its Hydra config stack is not installed and its committed
configs are inconsistent — SURVEY.md §2.9 — so the baseline is our
architecture-faithful re-implementation with the reference's numerics and
no TPU-specific optimizations.)

Ours: the TPU-native serving path — bfloat16 compute, AOT-compiled, with a
ToMe token-merging variant as the headline.

Measurement protocol (round 2 — DEVICE time, not enqueue time):
  On this rig ``jax.block_until_ready`` over the axon tunnel returns
  without awaiting remote execution, so wall-clock around enqueued calls
  measures dispatch only (round 1 reported ~28x over v5e peak this way).
  Instead every variant is timed as a K-iteration ``lax.fori_loop`` INSIDE
  one jitted computation whose result is a scalar checksum of every
  iteration's output; ``float(...)`` on that scalar forces a real
  device->host transfer, which cannot complete before the loop does.  K is
  a dynamic argument (one compile serves every K) and all tensors are jit
  ARGUMENTS, not captured consts (consts are serialized into the remote
  compile request and blow its size limit).  The per-iteration input is
  selected with ``dynamic_index_in_dim(i % n)`` and the RNG is
  ``fold_in(key, i)`` so no iteration is loop-invariant (nothing can be
  hoisted or CSE'd out of the loop).  sec/call is the two-point slope
  (t(K2) - t(K1)) / (K2 - K1), which cancels the fixed dispatch+transfer
  overhead exactly.

  Every throughput number is cross-checked against the compiled
  executable's own FLOP count (``compiled.cost_analysis()['flops']``):
  the bench FAILS LOUDLY if any variant implies more than the chip's peak
  FLOP/s (MFU > 1), and reports achieved TFLOP/s + MFU per variant.

Env knobs: BENCH_BATCH (default 32), BENCH_REPS, BENCH_SKIP_EXTRAS=1
(headline only), BENCH_DEEP=1 / BENCH_MULTICAM=1 (alternate workloads).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: the axon tunnel's dispatch latency makes cold
# compiles expensive (minutes on a congested day); cached executables make
# repeat bench runs cheap.  Safe to set post-import — the cache is consulted
# at compile time, not at backend registration.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache")))

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
REPS = int(os.environ.get("BENCH_REPS", "3"))
N_INPUTS = 2
SKIP_EXTRAS = os.environ.get("BENCH_SKIP_EXTRAS") == "1"
DEEP = os.environ.get("BENCH_DEEP") == "1"
MULTICAM = os.environ.get("BENCH_MULTICAM") == "1"
DECOMP = os.environ.get("BENCH_DECOMP") == "1"

# bf16 peak FLOP/s per chip by device kind — the physical ceiling used for
# the MFU sanity assert (any measurement implying more is a broken bench,
# not a fast program).  f32 peak on TPU MXU is lower, so bf16 peak is a
# valid upper bound for every dtype we run.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e: 197 bf16 TFLOP/s
    "TPU v5e": 197e12,
    "TPU v5": 459e12,       # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
    "TPU v6e": 918e12,
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def device_peak_flops():
    kind = jax.devices()[0].device_kind
    for name, peak in PEAK_FLOPS.items():
        if kind.startswith(name):
            return peak, kind
    return None, kind  # unknown (e.g. CPU smoke run): skip the assert


def flops_of(compiled):
    """FLOPs of one call of an AOT-compiled function, from XLA's own cost
    model.  Returns None when the backend doesn't expose it."""
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def build_loop(step_fn):
    """jit a K-iteration fori_loop over ``step_fn(i, *args) -> scalar``.
    K is dynamic (while-loop lowering: one compile serves every K); *args
    are jit arguments so no large tensor is baked into the executable."""
    @jax.jit
    def loop(k, *args):
        def body(i, acc):
            return acc + step_fn(i, *args)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0),
                                 unroll=False)
    return loop


def _run(loop, k, args):
    t0 = time.perf_counter()
    out = float(loop(jnp.int32(k), *args))  # float() forces a real
    dt = time.perf_counter() - t0           # device->host transfer
    assert np.isfinite(out), f"non-finite checksum {out}"
    return dt


def sec_per_call(loop, args, label=""):
    """Two-point slope timing: cancels fixed dispatch/transfer overhead."""
    _run(loop, 2, args)  # warm: compile + const upload
    k1 = 4
    t1 = _run(loop, k1, args)
    est = max((t1 - 0.02) / k1, 2e-5)
    k2 = int(np.clip(1.0 / est, k1 + 16, 400))
    ts1, ts2 = [], []
    for _ in range(REPS):  # interleave so tunnel drift spreads evenly
        ts1.append(_run(loop, k1, args))
        ts2.append(_run(loop, k2, args))
    t1m, t2m = float(np.median(ts1)), float(np.median(ts2))
    slope = (t2m - t1m) / (k2 - k1)
    if slope <= 0:  # noise swamped the delta; fall back to the upper bound
        slope = t2m / k2
    log(f"[bench] {label}: K=({k1},{k2}) t=({t1m*1e3:.1f},{t2m*1e3:.1f})ms "
        f"-> {slope*1e3:.3f} ms/call")
    return slope


def paired_ab(loop_a, args_a, loop_b, args_b, label="", reps=6):
    """Paired A/B ratio with ABBA blocking: cancels the slow linear
    drift of the time-shared tunnel that swamps sub-2x differences when
    arms are measured minutes apart (each arm's absolute sec/call from
    sec_per_call is unaffected; this is for the RATIO claim).

    Each arm visit is a TWO-POINT SLOPE — (t(K2) - t(K1)) / (K2 - K1) —
    so the fixed dispatch/transfer overhead cancels exactly (a plain
    per-call ratio at moderate K attenuates real differences toward 1:
    the overhead is a common additive term in both arms).  Visits are
    blocked A,B,B,A; per-block ratio = mean B slope / mean A slope;
    returns (ratio_b_over_a_median, ratios).  ratio > 1 means B slower.
    """
    k1 = 8
    for loop, args in ((loop_a, args_a), (loop_b, args_b)):
        _run(loop, 2, args)  # warm/compile
    ta = _run(loop_a, k1, args_a)
    tb = _run(loop_b, k1, args_b)

    def big_k(t8):
        est = max((t8 - 0.02) / k1, 2e-5)  # per-call estimate sans overhead
        return int(np.clip(0.6 / est, k1 + 32, 4000))

    ka, kb = big_k(ta), big_k(tb)

    def slope(loop, args, k2):
        t1 = _run(loop, k1, args)
        t2 = _run(loop, k2, args)
        s = (t2 - t1) / (k2 - k1)
        # non-positive slope = tunnel noise swamped the K delta; a t2/k2
        # fallback here would measure an overhead-INCLUSIVE per-call time,
        # a different quantity than the other arm's visits, silently
        # biasing the block ratio toward 1 — drop the block instead
        return s if s > 0 else None

    ratios, dropped = [], 0
    attempts = 0
    while len(ratios) < reps and attempts < 2 * reps:
        attempts += 1
        a1 = slope(loop_a, args_a, ka)
        b1 = slope(loop_b, args_b, kb)
        b2 = slope(loop_b, args_b, kb)
        a2 = slope(loop_a, args_a, ka)
        if None in (a1, b1, b2, a2):
            dropped += 1
            log(f"[bench] paired {label}: dropped a block (non-positive "
                f"two-point slope — tunnel noise); retrying")
            continue
        ratios.append(((b1 + b2) / 2) / ((a1 + a2) / 2))
    if not ratios:
        log(f"[bench] paired {label}: EVERY block had a non-positive "
            f"slope — the arms are too fast for the K spread; no ratio")
        return None, []
    med = float(np.median(ratios))
    log(f"[bench] paired {label}: B/A = {med:.3f} "
        f"(blocks: {', '.join(f'{r:.3f}' for r in ratios)}"
        f"{f'; {dropped} dropped' if dropped else ''})")
    return med, ratios


def check_mfu(name, sec, flops, peak, entry):
    """Record achieved TFLOP/s + MFU; fail loudly on physically impossible
    numbers (the round-1 failure mode this protocol exists to prevent)."""
    if flops is None:
        entry["mfu"] = None
        return
    achieved = flops / sec
    entry["tflops"] = round(achieved / 1e12, 2)
    if peak is not None:
        mfu = achieved / peak
        entry["mfu"] = round(mfu, 4)
        if mfu > 1.0:
            log(f"[bench] FATAL: {name} implies {achieved/1e12:.1f} TFLOP/s "
                f"> peak {peak/1e12:.0f} (MFU {mfu:.2f}) — the measurement "
                f"is not awaiting device execution; refusing to report it.")
            raise SystemExit(1)


# ---------------------------------------------------------------------------
# workloads
# ---------------------------------------------------------------------------

def serve_step(model, method):
    """Per-iteration scalar for an obs->action serving variant.
    args = (variables, text_or_emb, images_stack, key)."""
    def step(i, variables, text, images_stack, key):
        img = jax.lax.dynamic_index_in_dim(images_stack,
                                           i % images_stack.shape[0],
                                           keepdims=False)
        rngs = {"diffusion": jax.random.fold_in(key, i)}
        out = model.apply(variables, text, img, rngs=rngs, method=method)
        return jnp.sum(out.astype(jnp.float32))
    return step


def main():
    from multi_modal_transformers_tokenmerge_tpu.core.yaml_loader import (
        load_config)
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo

    peak, kind = device_peak_flops()
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((BATCH, 16), dtype=jnp.int32)
    rng = np.random.default_rng(0)
    frames = 4 if MULTICAM else 2
    images_stack = jnp.asarray(
        rng.integers(0, 256, (N_INPUTS, BATCH, frames, 280, 280, 3)),
        dtype=jnp.float32)
    log(f"[bench] batch={BATCH} frames={frames} device={kind} "
        f"peak={'%.0f TF' % (peak/1e12) if peak else 'unknown'}")

    if MULTICAM:
        from multi_modal_transformers_tokenmerge_tpu.models.presets import (
            octo_multicam)
        base_mc = octo_multicam()
        base_mc = base_mc.replace(images=base_mc.images.replace(
            resnet=base_mc.images.resnet.replace(conv_layout="nhwc")))
        tome_mc = octo_multicam().replace(
            compression_sequence=("[TaskDescriptionPrefix{0}] "
                                  "[Image{2};Image{2};Readout{0}]*2"),
            transformer=base_mc.transformer.replace(
                compression_mode="merge"))
        configs = {
            "baseline_f32": base_mc,
            "ours_bf16": octo_multicam(dtype="bfloat16"),
            "ours_bf16_tome": tome_mc.replace(dtype="bfloat16"),
        }
        metric_tag = "octo_multicam"
    else:
        # baseline stays architecture-faithful: f32 AND the flax-standard
        # NHWC conv path — the batch-in-lanes layout is one of OUR
        # TPU-specific optimizations and must not leak into the baseline
        configs = {
            "baseline_f32": load_config(
                "octo_base", ["images.resnet.conv_layout=nhwc"]),
            "ours_bf16": load_config("octo_base", ["dtype=bfloat16"]),
            "ours_bf16_tome": load_config("octo_base_tome",
                                          ["dtype=bfloat16"]),
        }
        metric_tag = "octo_base"

    results = {}
    models = {}
    for name, cfg in configs.items():
        t0 = time.time()
        model = Octo(cfg)
        variables = jax.jit(model.init)(
            {"params": keys[0], "patch_encoding": keys[1],
             "dropout": keys[2], "diffusion": keys[3]},
            text, images_stack[0])
        # single-call AOT compile: used only for XLA's FLOP count
        single = jax.jit(
            lambda v, t, im, k, model=model: model.apply(
                v, t, im, rngs={"diffusion": k},
                method="predict_diffusion_action")
        ).lower(variables, text, images_stack[0], keys[3]).compile()
        flops = flops_of(single)
        loop = build_loop(serve_step(model, "predict_diffusion_action"))
        sec = sec_per_call(loop, (variables, text, images_stack, keys[3]),
                           name)
        results[name] = {
            "ms_per_call": round(sec * 1e3, 3),
            "inf_per_sec": round(BATCH / sec, 1),
            "gflops_per_call": round(flops / 1e9, 1) if flops else None,
        }
        check_mfu(name, sec, flops, peak, results[name])
        models[name] = (model, variables)
        log(f"[bench] {name}: {BATCH/sec:.0f} inf/s ({sec*1e3:.2f} ms/call, "
            f"{results[name].get('tflops', '?')} TFLOP/s, "
            f"MFU {results[name].get('mfu', '?')}) "
            f"[total {time.time()-t0:.0f}s]")

    # only the bf16 variant is consumed below — drop the f32/tome
    # variants' device-resident parameter copies before the extras so the
    # train-step compile doesn't run with hundreds of MB of dead HBM
    models = {"ours_bf16": models["ours_bf16"]}

    detail = {"batch": BATCH, "device": kind, "variants": results}

    if not SKIP_EXTRAS:
        detail["serving_b1"] = bench_serving_b1(models["ours_bf16"], peak)
        detail["train"] = bench_train(configs["ours_bf16"], images_stack,
                                      text, peak)
        detail["int8_text_tower"] = bench_int8_text(
            models["ours_bf16"], images_stack, text, peak,
            results["ours_bf16"])
        if not MULTICAM:
            # the fork's named feature at the depth it is for (VERDICT r2
            # item 2): recorded in the driver-captured artifact each round
            detail["deep_stack_tome_224tok_12blk"] = bench_deep()
            detail["flash_attention_s1024"] = bench_flash(peak)
            detail["attention_op_s1024"] = bench_flash_op(peak)
            # round-3 measurement gates: Pallas pool backward + int8
            # image tower (both ship default-off until these numbers
            # win).  Defensive: a kernel-compile failure here must not
            # take down the headline artifact.
            for key_, thunk in (
                # per-regime train table (VERDICT r4 item 5): deep
                # ToMe/vanilla + multicam with ANALYTIC MFU accounting
                ("train_regimes", lambda: bench_train_regimes(peak)),
                ("pool_bwd_pallas", bench_pool_bwd),
                ("train_pool_pallas", lambda: bench_train(
                    configs["ours_bf16"].replace(
                        images=configs["ours_bf16"].images.replace(
                            resnet=configs["ours_bf16"].images.resnet
                            .replace(pool_vjp="pallas"))),
                    images_stack, text, peak)),
                ("int8_image_tower", lambda: bench_int8_image(
                    models["ours_bf16"], images_stack, peak,
                    results["ours_bf16"])),
            ):
                try:
                    detail[key_] = thunk()
                except Exception as e:  # noqa: BLE001 — record, don't die
                    log(f"[bench] {key_} FAILED: {type(e).__name__}: "
                        f"{str(e)[:300]}")
                    detail[key_] = {"error":
                                    f"{type(e).__name__}: {str(e)[:300]}"}

    ours = results["ours_bf16_tome"]
    base = results["baseline_f32"]
    payload = {
        "metric": (f"obs_to_action_inferences_per_sec_per_chip_"
                   f"{metric_tag}_diffusion_tome"),
        "value": ours["inf_per_sec"],
        "unit": "inferences/sec/chip",
        "vs_baseline": round(base["ms_per_call"] / ours["ms_per_call"], 3),
        "detail": detail,
    }
    emit_final(payload, "multicam" if MULTICAM else "headline")


def emit_final(payload, mode):
    """Record the FULL payload under benchmarks/recorded/ (and point
    LATEST.json at it), then print ONE compact final JSON line.

    The driver captures only the tail of bench.py's output
    (VERDICT r3 item 7: BENCH_r03 lost its own headline keys because the
    full detail blob ran past the capture window), so the LAST line must
    be a self-contained summary well under 2,000 chars; everything else
    lives in the recorded artifact the summary names.
    """
    rec = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "benchmarks", "recorded")
    fname = f"bench_{mode}_latest_full.json"
    try:
        os.makedirs(rec, exist_ok=True)
        with open(os.path.join(rec, fname), "w") as f:
            f.write(json.dumps(payload) + "\n")
        latest_path = os.path.join(rec, "LATEST.json")
        try:
            with open(latest_path) as f:
                latest = json.load(f)
        except (OSError, ValueError):
            latest = {}
        latest[mode] = fname
        with open(latest_path, "w") as f:
            f.write(json.dumps(latest, indent=1) + "\n")
    except OSError as e:  # read-only checkout: keep the summary alive
        log(f"[bench] could not record full artifact: {e}")

    print(compact_line(payload, fname), flush=True)


def compact_line(payload, fname):
    """One-line JSON summary of a full bench payload, <= ~2,000 chars."""
    d = payload.get("detail", {})
    compact_detail = {"device": d.get("device"), "batch": d.get("batch"),
                      "full_artifact": f"benchmarks/recorded/{fname}"}
    for name, v in (d.get("variants") or {}).items():
        compact_detail[name] = {
            k: v[k] for k in ("ms_per_call", "inf_per_sec", "mfu")
            if k in v}
    if isinstance(d.get("train"), dict):
        compact_detail["train"] = {
            k: d["train"][k] for k in ("ms_per_step", "mfu",
                                       "examples_per_sec")
            if k in d["train"]}
    if isinstance(d.get("serving_b1"), dict):
        compact_detail["serving_b1_p50_ms"] = d["serving_b1"].get("p50_ms")
        if "ddim8_p50_ms" in d["serving_b1"]:
            compact_detail["serving_b1_ddim8_p50_ms"] = \
                d["serving_b1"]["ddim8_p50_ms"]
        if "ddim8_speedup_paired" in d["serving_b1"]:
            compact_detail["serving_b1_ddim8_speedup_paired"] = \
                d["serving_b1"]["ddim8_speedup_paired"]
    tr = d.get("train_regimes")
    if isinstance(tr, dict):
        compact_detail["train_mfu_analytic"] = {
            k: v.get("mfu_analytic") for k, v in tr.items()
            if isinstance(v, dict)}
        for k in ("tome_train_speedup_vs_vanilla",
                  "prestack_train_speedup_vs_vanilla"):
            if k in tr:
                compact_detail[k] = tr[k]
    deep = d.get("deep_stack_tome_224tok_12blk")
    if isinstance(deep, dict):
        compact_detail["deep_tome"] = {
            "seq_per_sec": deep.get("sequences_per_sec_tome"),
            "speedup": deep.get("tome_speedup_vs_vanilla")}
    i8t = d.get("int8_text_tower")
    if isinstance(i8t, dict):
        b1 = (i8t.get("tower_only_sweep") or {}).get("b1") or {}
        if "w8_speedup" in b1:
            compact_detail["text_tower_b1"] = {
                k: b1[k] for k in ("int8_speedup", "w8_speedup")}
    compact = {k: payload[k] for k in ("metric", "value", "unit",
                                       "vs_baseline", "stale",
                                       "stale_reason") if k in payload}
    compact["detail"] = compact_detail
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1950:  # belt and braces: never exceed the capture tail
        compact["detail"] = {"full_artifact":
                             f"benchmarks/recorded/{fname}"}
        line = json.dumps(compact, separators=(",", ":"))
    return line


def bench_serving_b1(model_vars, peak):
    """North-star p50: batch-1 obs->action latency with the instruction's
    text embedding precomputed (the cached-instruction serving path).
    The fori_loop is serial, so slope == true per-call device latency."""
    model, variables = model_vars
    rng = np.random.default_rng(1)
    frames = 4 if MULTICAM else 2
    images = jnp.asarray(
        rng.integers(0, 256, (N_INPUTS, 1, frames, 280, 280, 3)),
        dtype=jnp.float32)
    text = jnp.ones((1, 16), dtype=jnp.int32)
    text_emb = model.apply(variables, text, method="encode_text")
    key = jax.random.PRNGKey(7)

    loop = build_loop(serve_step(model, "predict_diffusion_action_with_text"))
    sec = sec_per_call(loop, (variables, text_emb, images, key),
                       "serving_b1_cached_text")
    # The ABSOLUTE p50 comes from the slope protocol and carries the
    # tunnel's cross-session drift (BASELINE.md round-6 caveat); every
    # RATIO below flows through paired-ABBA, the only b1 comparison
    # protocol of record (VERDICT r4 item 4 — single-arm b1 ordering
    # swings ~2x between adjacent arms in one session).
    out = {"p50_ms": round(sec * 1e3, 3), "batch": 1, "cached_text": True,
           "protocol": "absolute=slope; ratios=paired-ABBA"}
    single = jax.jit(
        lambda v, te, im, k: model.apply(
            v, te, im, rngs={"diffusion": k},
            method="predict_diffusion_action_with_text")
    ).lower(variables, text_emb, images[0], key).compile()
    flops = flops_of(single)
    if flops:
        out["gflops_per_call"] = round(flops / 1e9, 2)
        if peak and flops / sec > peak:
            log("[bench] FATAL: serving_b1 exceeds peak FLOP/s")
            raise SystemExit(1)
    log(f"[bench] serving_b1: p50 {sec*1e3:.2f} ms")

    # DDIM-8 arm: same checkpoint, 8-step deterministic sampler
    # (heads/diffusion.py:ddim_schedule) — the opt-in low-latency decode
    cfg = model.config
    ddim_model = model.clone(config=cfg.replace(heads=cfg.heads.replace(
        diffusion=cfg.heads.diffusion.replace(ddim_steps=8))))
    loop8 = build_loop(
        serve_step(ddim_model, "predict_diffusion_action_with_text"))
    sec8 = sec_per_call(loop8, (variables, text_emb, images, key),
                        "serving_b1_cached_text_ddim8")
    out["ddim8_p50_ms"] = round(sec8 * 1e3, 3)
    ratio, blocks = paired_ab(loop, (variables, text_emb, images, key),
                              loop8, (variables, text_emb, images, key),
                              label="b1_ddim8_vs_ddpm32")
    if ratio is not None:
        out["ddim8_speedup_paired"] = round(1.0 / ratio, 3)
        out["ddim8_paired_blocks"] = [round(r, 3) for r in blocks]
        spread = (max(blocks) - min(blocks)) / ratio if blocks else None
        out["ddim8_paired_block_spread"] = round(spread, 3)
    log(f"[bench] serving_b1 ddim8: p50 {sec8*1e3:.2f} ms "
        f"(paired speedup {out.get('ddim8_speedup_paired', '?')}x)")
    return out


def bench_int8_text(model_vars, images_stack, text, peak, bf16_entry):
    """obs->action with the frozen T5 tower int8-quantized
    (serve/quantize.py): text encoded per call via int8 MXU dots, rest of
    the model unchanged via the *_with_text method.  Opt-in serving mode."""
    from multi_modal_transformers_tokenmerge_tpu.serve.quantize import (
        quantize_t5_params, t5_encode_int8)

    model, variables = model_vars
    tcfg = model.config.text
    if tcfg.kind != "t5":
        return {"skipped": "text tower is not t5"}
    qp = quantize_t5_params(variables["params"]["text_encoder"]["t5_encoder"])

    def step(i, variables, qp, text, images_stack, key):
        img = jax.lax.dynamic_index_in_dim(images_stack,
                                           i % images_stack.shape[0],
                                           keepdims=False)
        emb = t5_encode_int8(
            qp, text, rel_pos_buckets=tcfg.t5_rel_pos_buckets,
            rel_pos_max_distance=tcfg.t5_rel_pos_max_distance,
            dtype=model.config.compute_dtype)
        rngs = {"diffusion": jax.random.fold_in(key, i)}
        out = model.apply(variables, emb, img, rngs=rngs,
                          method="predict_diffusion_action_with_text")
        return jnp.sum(out.astype(jnp.float32))

    key = jax.random.PRNGKey(9)
    sec = sec_per_call(build_loop(step),
                       (variables, qp, text, images_stack, key),
                       "int8_text_tower")
    out = {"ms_per_call": round(sec * 1e3, 3),
           "inf_per_sec": round(BATCH / sec, 1),
           "speedup_vs_bf16_tower": round(
               bf16_entry["ms_per_call"] / (sec * 1e3), 3)}
    if peak:
        # FLOP floor from the bf16 variant's count (int8 does the same math)
        flops = (bf16_entry.get("gflops_per_call") or 0) * 1e9
        if flops and flops / sec > 2 * peak:  # int8 peak = 2x bf16 on v5e
            log("[bench] FATAL: int8 variant exceeds int8 peak")
            raise SystemExit(1)
    log(f"[bench] int8_text: {BATCH/sec:.0f} inf/s ({sec*1e3:.2f} ms/call, "
        f"{out['speedup_vs_bf16_tower']}x vs bf16 tower)")

    # --- regime sweep (VERDICT r2 item 9): where int8 actually pays.
    # At batch 32 the tower is MXU-bound and int8 is a wash end-to-end; at
    # batch 1 (uncached-instruction serving) the 110M-param tower is
    # WEIGHT-BANDWIDTH-bound, which is exactly what int8 halves.
    def tower_step_bf16(i, variables, texts):
        # texts: (2, B, L) — dynamic per-iteration selection so nothing is
        # loop-invariant (a `*0` trick gets constant-folded and the whole
        # tower hoists out of the loop)
        t = jax.lax.dynamic_index_in_dim(texts, i % 2, keepdims=False)
        emb = model.apply(variables, t, method="encode_text")
        return jnp.sum(emb.astype(jnp.float32))

    def tower_step_q(mode):
        def step(i, qp, texts):
            t = jax.lax.dynamic_index_in_dim(texts, i % 2, keepdims=False)
            emb = t5_encode_int8(
                qp, t, rel_pos_buckets=tcfg.t5_rel_pos_buckets,
                rel_pos_max_distance=tcfg.t5_rel_pos_max_distance,
                dtype=model.config.compute_dtype, mode=mode)
            return jnp.sum(emb.astype(jnp.float32))
        return step

    sweep = {}
    rng_t = np.random.default_rng(5)
    for bsz in (1, BATCH):
        t_b = jnp.asarray(rng_t.integers(3, 1000, (2, bsz, text.shape[1])),
                          dtype=text.dtype)
        s_bf = sec_per_call(build_loop(tower_step_bf16),
                            (variables, t_b), f"text_tower_bf16_b{bsz}")
        s_i8 = sec_per_call(build_loop(tower_step_q("int8")),
                            (qp, t_b), f"text_tower_int8_b{bsz}")
        # w8 = weight-only int8 (round 5): the b1 recommendation —
        # kernels fetched int8, bf16 compute, no activation-quant error
        s_w8 = sec_per_call(build_loop(tower_step_q("w8")),
                            (qp, t_b), f"text_tower_w8_b{bsz}")
        entry = {
            "bf16_ms": round(s_bf * 1e3, 3),
            "int8_ms": round(s_i8 * 1e3, 3),
            "w8_ms": round(s_w8 * 1e3, 3),
        }
        if bsz == 1:
            # sub-2x b1 ratios are only resolvable paired (VERDICT r4
            # item 4): ABBA-blocked two-point slopes, drift cancels
            for mode, args_q in (("int8", (qp, t_b)), ("w8", (qp, t_b))):
                r, blocks = paired_ab(
                    build_loop(tower_step_bf16), (variables, t_b),
                    build_loop(tower_step_q(mode)), args_q,
                    label=f"text_tower_{mode}_b1")
                if r is not None:
                    entry[f"{mode}_speedup"] = round(1.0 / r, 3)
                    entry[f"{mode}_paired_blocks"] = [
                        round(x, 3) for x in blocks]
        else:
            entry["int8_speedup"] = round(s_bf / s_i8, 3)
            entry["w8_speedup"] = round(s_bf / s_w8, 3)
        sweep[f"b{bsz}"] = entry
        log(f"[bench] text tower b={bsz}: bf16 {s_bf*1e3:.3f} ms, "
            f"int8 {s_i8*1e3:.3f} ms ({entry.get('int8_speedup', '?')}x), "
            f"w8 {s_w8*1e3:.3f} ms ({entry.get('w8_speedup', '?')}x)")
    out["tower_only_sweep"] = sweep
    return out


def bench_pool_bwd():
    """Op-level max-pool backward at embedder shapes: XLA
    select_and_scatter vs the Pallas kernel (ops/pool.py).  Gates
    pool_vjp's default."""
    from multi_modal_transformers_tokenmerge_tpu.ops.pool import (
        max_pool_hwcn)

    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(11), 2)
    x2 = jax.random.normal(ks[0], (2, 23, 23, 64, BATCH * 50), dt)
    g2 = jax.random.normal(ks[1], (2, 21, 21, 64, BATCH * 50), dt)

    def xla_pool(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (3, 3, 1, 1), (1, 1, 1, 1), "VALID")

    interp = jax.default_backend() != "tpu"  # CPU smoke runs

    def pal_pool(x):
        return max_pool_hwcn(x, (3, 3), (1, 1), vjp="pallas",
                             interpret=interp)

    out = {}
    for name, fn in (("xla", xla_pool), ("pallas", pal_pool)):
        def grad_step(i, x2, g2, fn=fn):
            x = jax.lax.dynamic_index_in_dim(x2, i % 2, keepdims=False)
            g = jax.lax.dynamic_index_in_dim(g2, i % 2, keepdims=False)
            _, vjp = jax.vjp(fn, x)
            return jnp.sum(vjp(g)[0].astype(jnp.float32))

        sec = sec_per_call(build_loop(grad_step), (x2, g2),
                           f"pool_bwd_{name}")
        out[f"{name}_ms"] = round(sec * 1e3, 3)
    out["pallas_speedup"] = round(out["xla_ms"] / max(out["pallas_ms"],
                                                      1e-9), 3)
    log(f"[bench] pool_bwd: xla {out['xla_ms']} ms, pallas "
        f"{out['pallas_ms']} ms ({out['pallas_speedup']}x)")
    return out


def bench_int8_image(model_vars, images_stack, peak, bf16_entry):
    """obs->action with the image tower int8-quantized
    (serve/quantize.py): patch embedder on the MXU's 2x byte path, rest
    of the model unchanged via predict_diffusion_action_with_modalities.
    Text embeddings cached (the serving configuration this targets)."""
    from multi_modal_transformers_tokenmerge_tpu.serve.quantize import (
        image_embed_int8, image_embed_w8, quantize_image_tower)

    model, variables = model_vars
    icfg = model.config.images
    qp = quantize_image_tower(model, variables)
    text_emb = jax.jit(
        lambda v, t: model.apply(v, t, method="encode_text"))(
        variables,
        jnp.ones((BATCH, model.config.text.max_length), jnp.int32))

    def tower_bf16(i, variables, images_stack):
        img = jax.lax.dynamic_index_in_dim(images_stack,
                                           i % images_stack.shape[0],
                                           keepdims=False)
        out = model.apply(variables, img, train=False,
                          method=lambda m, x, train:
                          m.image_encoder(x, train))
        return jnp.sum(out.astype(jnp.float32))

    def tower_int8(i, qp, images_stack):
        img = jax.lax.dynamic_index_in_dim(images_stack,
                                           i % images_stack.shape[0],
                                           keepdims=False)
        out = image_embed_int8(qp, img, icfg,
                               dtype=model.config.compute_dtype)
        return jnp.sum(out.astype(jnp.float32))

    def e2e_int8(i, variables, qp, text_emb, images_stack, key):
        img = jax.lax.dynamic_index_in_dim(images_stack,
                                           i % images_stack.shape[0],
                                           keepdims=False)
        emb = image_embed_int8(qp, img, icfg,
                               dtype=model.config.compute_dtype)
        rngs = {"diffusion": jax.random.fold_in(key, i)}
        out = model.apply(variables, text_emb, emb, rngs=rngs,
                          method="predict_diffusion_action_with_modalities")
        return jnp.sum(out.astype(jnp.float32))

    def tower_w8(i, qp, images_stack):
        img = jax.lax.dynamic_index_in_dim(images_stack,
                                           i % images_stack.shape[0],
                                           keepdims=False)
        out = image_embed_w8(qp, img, icfg,
                             dtype=model.config.compute_dtype)
        return jnp.sum(out.astype(jnp.float32))

    s_bf = sec_per_call(build_loop(tower_bf16), (variables, images_stack),
                        "img_tower_bf16")
    s_i8 = sec_per_call(build_loop(tower_int8), (qp, images_stack),
                        "img_tower_int8")
    s_w8 = sec_per_call(build_loop(tower_w8), (qp, images_stack),
                        "img_tower_w8")
    key = jax.random.PRNGKey(13)
    s_e2e = sec_per_call(build_loop(e2e_int8),
                         (variables, qp, text_emb, images_stack, key),
                         "img_tower_int8_e2e")
    out = {
        "tower_bf16_ms": round(s_bf * 1e3, 3),
        "tower_int8_ms": round(s_i8 * 1e3, 3),
        "tower_speedup": round(s_bf / max(s_i8, 1e-9), 3),
        "tower_w8_ms": round(s_w8 * 1e3, 3),
        "tower_w8_speedup": round(s_bf / max(s_w8, 1e-9), 3),
        "e2e_int8_cachedtext_ms": round(s_e2e * 1e3, 3),
        "e2e_inf_per_sec": round(BATCH / s_e2e, 1),
    }
    if peak:
        flops = (bf16_entry.get("gflops_per_call") or 0) * 1e9
        if flops and flops / s_e2e > 2 * peak:  # int8 peak = 2x bf16
            log("[bench] FATAL: int8 image variant exceeds int8 peak")
            raise SystemExit(1)
    log(f"[bench] int8_image: tower {out['tower_bf16_ms']} -> "
        f"{out['tower_int8_ms']} ms ({out['tower_speedup']}x); e2e "
        f"{out['e2e_int8_cachedtext_ms']} ms cached-text")
    return out


def bench_train(cfg, images_stack, text, peak):
    """Donated jitted diffusion train step throughput (steps/sec)."""
    import optax
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
    from multi_modal_transformers_tokenmerge_tpu.train.state import (
        create_train_state)
    from multi_modal_transformers_tokenmerge_tpu.train.steps import (
        make_train_step)

    from multi_modal_transformers_tokenmerge_tpu.train.optim import (
        mask_frozen)

    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        text, images_stack[0])
    # the T5 tower is frozen (stop_gradient, as in the reference) — mask
    # it out of the optimizer so its 110M params carry no m/v traffic
    tx = optax.adamw(1e-4)
    if cfg.text.kind == "t5":
        tx = mask_frozen(tx, variables["params"])
    state0 = create_train_state(
        model, variables, tx,
        rngs={"dropout": keys[2], "patch_encoding": keys[1],
              "diffusion": keys[3]})
    actions = jnp.full((BATCH, 8), 0.3, dtype=jnp.float32)
    raw_step = make_train_step("diffusion", donate=False, jit=False)

    def make_loop(step_fn):
        @jax.jit
        def loop(k, state0, text_arg, images_stack, actions):
            def body(i, carry):
                state, acc = carry
                img = jax.lax.dynamic_index_in_dim(images_stack,
                                                   i % images_stack.shape[0],
                                                   keepdims=False)
                state, loss = step_fn(state, text_arg, img, actions)
                return state, acc + loss
            _, acc = jax.lax.fori_loop(0, k, body,
                                       (state0, jnp.float32(0.0)),
                                       unroll=False)
            return acc
        return loop

    def measure(loop, args):
        def run(k):
            t0 = time.perf_counter()
            out = float(loop(jnp.int32(k), *args))
            dt = time.perf_counter() - t0
            assert np.isfinite(out), out
            return dt
        run(2)
        k1, k2 = 4, 40
        ts1 = [run(k1) for _ in range(REPS)]
        ts2 = [run(k2) for _ in range(REPS)]
        sec = (float(np.median(ts2)) - float(np.median(ts1))) / (k2 - k1)
        if sec <= 0:
            sec = float(np.median(ts2)) / k2
        return sec

    sec = measure(make_loop(raw_step), (state0, text, images_stack, actions))
    single = jax.jit(raw_step, donate_argnums=0).lower(
        state0, text, images_stack[0], actions).compile()
    flops = flops_of(single)
    out = {"steps_per_sec": round(1.0 / sec, 2),
           "ms_per_step": round(sec * 1e3, 3), "batch": BATCH,
           "examples_per_sec": round(BATCH / sec, 1)}
    if flops and peak:
        mfu = flops / sec / peak
        out["mfu"] = round(mfu, 4)
        if mfu > 1.0:
            log("[bench] FATAL: train step exceeds peak FLOP/s")
            raise SystemExit(1)
    log(f"[bench] train: {1.0/sec:.1f} steps/s ({sec*1e3:.1f} ms/step, "
        f"MFU {out.get('mfu', '?')})")

    if cfg.text.kind == "t5":
        # cached-text training (utils.data.cache_text_embeddings): the
        # frozen tower's output is precomputed per instruction, the step
        # trains on embeddings — identical objective, tower forward
        # skipped every step
        emb = jax.jit(lambda v, t: model.apply(v, t, method="encode_text"))(
            variables, text)
        step_ct = make_train_step("diffusion", donate=False, jit=False,
                                  text_input="embeddings")
        sec_ct = measure(make_loop(step_ct),
                         (state0, emb, images_stack, actions))
        out["cached_text"] = {
            "steps_per_sec": round(1.0 / sec_ct, 2),
            "ms_per_step": round(sec_ct * 1e3, 3),
            "speedup_vs_ids": round(sec / sec_ct, 3),
        }
        log(f"[bench] train cached-text: {1.0/sec_ct:.1f} steps/s "
            f"({sec_ct*1e3:.1f} ms/step, {sec/sec_ct:.2f}x vs ids)")

    if (jax.default_backend() == "tpu"
            and getattr(cfg.images.resnet, "pool_vjp", "xla") == "xla"):
        # A/B the Pallas max-pool backward (ops/pool.py) in the SAME
        # session: select_and_scatter is ~19% of this backward and the
        # config default ('xla', round-2 rule: no unmeasured perf
        # defaults) flips only on this recorded end-to-end number
        cfg_p = cfg.replace(images=cfg.images.replace(
            resnet=cfg.images.resnet.replace(pool_vjp="pallas")))
        model_p = Octo(cfg_p)
        state_p = create_train_state(
            model_p, variables, tx,
            rngs={"dropout": keys[2], "patch_encoding": keys[1],
                  "diffusion": keys[3]})
        sec_p = measure(make_loop(raw_step),
                        (state_p, text, images_stack, actions))
        out["pool_vjp_pallas"] = {
            "ms_per_step": round(sec_p * 1e3, 3),
            "speedup_vs_xla_vjp": round(sec / sec_p, 3),
        }
        log(f"[bench] train pool_vjp=pallas: {sec_p*1e3:.1f} ms/step "
            f"({sec/sec_p:.2f}x vs select_and_scatter)")
    return out


def analytic_fwd_flops(cfg, batch):
    """Dense-matmul forward FLOPs of backbone stack + T5 tower + diffusion
    head, computed ANALYTICALLY (matmul (m,k)x(k,n) = 2mkn).

    Why not XLA's count: ``nn.scan`` bodies are costed ONCE by
    cost_analysis, so any multi-block scanned stack (octo_deep, the T5
    tower) is undercounted by ~num_blocks x — the reason no deep-regime
    train MFU was ever recorded (VERDICT r4 item 5).  Ignored terms (LN,
    softmax, biases, pos-embeds, pooling) are <3% of the matmul total at
    these shapes.  Returns (stack, t5, head) fwd FLOPs per call."""
    from multi_modal_transformers_tokenmerge_tpu.sequence.layout import (
        SequenceLayout)

    layout = SequenceLayout.from_strings(cfg.input_sequence,
                                         cfg.compression_sequence)
    t = cfg.transformer
    e, m = cfg.token_embedding_dim, t.mlp_dim

    def block(s, e, m, inner=None):
        inner = e if inner is None else inner
        # qkv+o projections, logits + attn@V, two MLP matmuls
        return (8 * s * e * inner + 4 * s * s * inner + 4 * s * e * m)

    off = 1 if t.prestack_merge else 0
    if t.compression_mode != "none" and layout.compressible:
        k = t.tome_merge_every
        if k <= 1:
            seqs = [layout.tokens_at_layer(layer + off)
                    for layer in range(t.num_blocks)]
        else:
            seqs, layer = [], 0
            for stage in range(-(-t.num_blocks // k)):
                blocks_here = min(k, t.num_blocks - layer)
                seqs += [layout.tokens_at_layer(stage + off)] * blocks_here
                layer += blocks_here
    else:
        seqs = [layout.total_tokens] * t.num_blocks
    stack = batch * sum(block(s, e, m) for s in seqs)

    t5 = 0
    tc = cfg.text
    if tc.kind == "t5":
        inner = tc.t5_num_heads * tc.t5_d_kv
        t5 = batch * tc.t5_num_layers * block(
            tc.max_length, tc.embedding_dim, tc.t5_d_ff, inner)

    head = 0
    hc = getattr(cfg.heads, "diffusion", None)
    if hc is not None:
        # one denoiser apply per train step: three input projections +
        # output + the Fourier-MLP time encoder
        head = 2 * batch * hc.mlp_dim * (
            hc.action_space_dim * 2 + hc.time_dim + e
            + hc.time_dim // 2 + hc.time_dim)
    return stack, t5, head


def bench_train_regimes(peak):
    """Per-regime train table (VERDICT r4 item 5): ms/step, examples/s,
    and ANALYTIC MFU for the regimes that matter — octo_deep ToMe (with
    and without the pre-stack merge), octo_deep vanilla, and multicam —
    alongside the XLA-counted octo_base row bench_train records.

    MFU accounting: train = 3x (stack + embedder + head) fwd FLOPs
    (backward ~ 2x forward) + 1x T5 fwd (the tower is FROZEN behind
    stop_gradient — no backward), embedder fwd from XLA's count (it is
    Python-looped, not scanned, so the count is exact), stack/T5/head
    from analytic_fwd_flops."""
    import optax
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
    from multi_modal_transformers_tokenmerge_tpu.models.presets import (
        octo_deep, octo_multicam)
    from multi_modal_transformers_tokenmerge_tpu.train.optim import (
        mask_frozen)
    from multi_modal_transformers_tokenmerge_tpu.train.state import (
        create_train_state)
    from multi_modal_transformers_tokenmerge_tpu.train.steps import (
        make_train_step)

    deep = octo_deep(dtype="bfloat16")
    regimes = {
        "octo_deep_tome": deep,
        "octo_deep_tome_prestack": deep.replace(
            transformer=deep.transformer.replace(prestack_merge=True)),
        "octo_deep_vanilla": deep.replace(
            compression_sequence=None,
            transformer=deep.transformer.replace(compression_mode="none")),
        "octo_multicam": octo_multicam(dtype="bfloat16"),
    }
    rng = np.random.default_rng(0)
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    out = {}
    for name, cfg in regimes.items():
        frames = 4 if name == "octo_multicam" else 2
        images_stack = jnp.asarray(
            rng.integers(0, 256, (N_INPUTS, BATCH, frames, 280, 280, 3)),
            dtype=jnp.float32)
        text = jnp.ones((BATCH, 16), dtype=jnp.int32)
        model = Octo(cfg)
        variables = jax.jit(model.init)(
            {"params": keys[0], "patch_encoding": keys[1],
             "dropout": keys[2], "diffusion": keys[3]},
            text, images_stack[0])
        tx = mask_frozen(optax.adamw(1e-4), variables["params"])
        state0 = create_train_state(
            model, variables, tx,
            rngs={"dropout": keys[2], "patch_encoding": keys[1],
                  "diffusion": keys[3]})
        actions = jnp.full((BATCH, 8), 0.3, dtype=jnp.float32)
        raw_step = make_train_step("diffusion", donate=False, jit=False)

        @jax.jit
        def loop(k, state0, text_arg, images_stack, actions,
                 raw_step=raw_step):
            def body(i, carry):
                state, acc = carry
                img = jax.lax.dynamic_index_in_dim(
                    images_stack, i % images_stack.shape[0], keepdims=False)
                state, loss = raw_step(state, text_arg, img, actions)
                return state, acc + loss
            _, acc = jax.lax.fori_loop(0, k, body,
                                       (state0, jnp.float32(0.0)),
                                       unroll=False)
            return acc

        def run(k):
            t0 = time.perf_counter()
            v = float(loop(jnp.int32(k), state0, text, images_stack,
                           actions))
            dt = time.perf_counter() - t0
            assert np.isfinite(v), v
            return dt
        run(2)
        k1, k2 = 4, 24
        t1 = float(np.median([run(k1) for _ in range(REPS)]))
        t2 = float(np.median([run(k2) for _ in range(REPS)]))
        sec = (t2 - t1) / (k2 - k1)
        if sec <= 0:
            sec = t2 / k2

        # embedder fwd FLOPs: XLA's count on the (non-scanned) tower
        emb_compiled = jax.jit(
            lambda v, im, model=model: model.apply(
                v, im, train=True,
                method=lambda mm, x, train: mm.image_encoder(x, train))
        ).lower(variables, images_stack[0]).compile()
        emb_flops = flops_of(emb_compiled) or 0.0
        stack_f, t5_f, head_f = analytic_fwd_flops(cfg, BATCH)
        train_flops = 3.0 * (stack_f + emb_flops + head_f) + t5_f
        entry = {
            "ms_per_step": round(sec * 1e3, 3),
            "steps_per_sec": round(1.0 / sec, 2),
            "examples_per_sec": round(BATCH / sec, 1),
            "tflops_analytic": round(train_flops / sec / 1e12, 2),
            "flops_breakdown_gflop": {
                "stack_fwd": round(stack_f / 1e9, 1),
                "embedder_fwd_xla": round(emb_flops / 1e9, 1),
                "t5_fwd": round(t5_f / 1e9, 1),
                "head_fwd": round(head_f / 1e9, 2)},
        }
        if peak:
            mfu = train_flops / sec / peak
            entry["mfu_analytic"] = round(mfu, 4)
            if mfu > 1.0:
                log(f"[bench] FATAL: {name} train exceeds peak FLOP/s")
                raise SystemExit(1)
        out[name] = entry
        log(f"[bench] train[{name}]: {1.0/sec:.1f} steps/s "
            f"({sec*1e3:.1f} ms/step, MFU {entry.get('mfu_analytic', '?')})")
        del state0, variables
    if ("octo_deep_tome" in out and "octo_deep_vanilla" in out):
        out["tome_train_speedup_vs_vanilla"] = round(
            out["octo_deep_vanilla"]["ms_per_step"]
            / out["octo_deep_tome"]["ms_per_step"], 3)
        out["prestack_train_speedup_vs_vanilla"] = round(
            out["octo_deep_vanilla"]["ms_per_step"]
            / out["octo_deep_tome_prestack"]["ms_per_step"], 3)
    return out


def bench_flash(peak, blocks=12, batch=8):
    """Pallas flash attention vs XLA on a long-context stack (1024-token
    5-camera 2-frame layout, 12 blocks, 768-dim): forward AND train-step
    (native Pallas backward vs XLA-recompute backward).  The honest
    crossover is between 512 and 1024 tokens (docs/KERNELS.md)."""
    from multi_modal_transformers_tokenmerge_tpu.core.config import (
        AttentionConfig, TransformerConfig)
    from multi_modal_transformers_tokenmerge_tpu.modules.attention import (
        TransformerStack)
    from multi_modal_transformers_tokenmerge_tpu.sequence.layout import (
        SequenceLayout)

    layout = SequenceLayout.from_strings(
        "[TaskDescriptionPrefix{16}] "
        "[Image{100};Image{100};Image{100};Image{100};Image{100};"
        "Readout{4}]*2")
    s, e = layout.total_tokens, 768
    mask = jnp.asarray(layout.attention_mask())
    xs = jnp.stack([
        jax.random.normal(jax.random.PRNGKey(i), (batch, s, e),
                          dtype=jnp.bfloat16) for i in range(N_INPUTS)])

    out = {"seq": s, "blocks": blocks, "batch": batch}
    stacks = {}
    for impl, bwd in (("xla", "xla"), ("flash", "xla"), ("flash", "pallas")):
        cfg = TransformerConfig(
            num_blocks=blocks,
            attention=AttentionConfig(num_heads=12, qkv_features=e,
                                      dropout_rate=0.0),
            attention_impl=impl, flash_backward=bwd,
            mlp_dim=4 * e, dropout_rate=0.0)
        stacks[(impl, bwd)] = TransformerStack(cfg, dtype=jnp.bfloat16)

    variables = jax.jit(
        lambda k, x: stacks[("xla", "xla")].init(k, x, mask=mask)
    )(jax.random.PRNGKey(1), xs[0])

    fwd = {}
    for impl in ("xla", "flash"):
        stack = stacks[(impl, "xla")]

        def step(i, variables, xs, mask, stack=stack):
            x = jax.lax.dynamic_index_in_dim(xs, i % xs.shape[0],
                                             keepdims=False)
            y = stack.apply(variables, x, mask=mask)
            return jnp.sum(y.astype(jnp.float32))
        sec = sec_per_call(build_loop(step), (variables, xs, mask),
                           f"flash_fwd_{impl}")
        single = jax.jit(
            lambda v, x, m, stack=stack: stack.apply(v, x, mask=m)
        ).lower(variables, xs[0], mask).compile()
        flops = flops_of(single)
        if flops and peak and flops / sec > peak:
            log(f"[bench] FATAL: flash fwd {impl} exceeds peak")
            raise SystemExit(1)
        fwd[impl] = sec
    out["forward_ms"] = {k: round(v * 1e3, 3) for k, v in fwd.items()}
    out["forward_flash_speedup"] = round(fwd["xla"] / fwd["flash"], 3)

    bwd = {}
    for impl, b in (("xla", "xla"), ("flash", "xla"), ("flash", "pallas")):
        stack = stacks[(impl, b)]

        def step(i, variables, xs, mask, stack=stack):
            x = jax.lax.dynamic_index_in_dim(xs, i % xs.shape[0],
                                             keepdims=False)

            def loss(v):
                y = stack.apply(v, x, mask=mask)
                return jnp.mean(jnp.square(y.astype(jnp.float32)))
            l, g = jax.value_and_grad(loss)(variables)
            leaves = jax.tree.leaves(g)
            return l + sum(jnp.sum(t.astype(jnp.float32)) for t in leaves)
        sec = sec_per_call(build_loop(step), (variables, xs, mask),
                           f"flash_train_{impl}_{b}")
        bwd[f"{impl}_{b}"] = sec
    out["train_ms"] = {k: round(v * 1e3, 3) for k, v in bwd.items()}
    out["train_flash_pallas_speedup_vs_xla_attn"] = round(
        bwd["xla_xla"] / bwd["flash_pallas"], 3)
    out["pallas_backward_speedup_vs_recompute"] = round(
        bwd["flash_xla"] / bwd["flash_pallas"], 3)
    log(f"[bench] flash@{s}: fwd {out['forward_ms']} train {out['train_ms']}")
    return out


def bench_flash_op(peak, batch=8, heads=12, head_dim=64):
    """Isolated attention op at S=1024 under the 5-camera block-causal mask:
    the kernel's own margin, undiluted by the MLP/projection FLOPs that
    dominate a whole stack (attention is ~18% of stack FLOPs at S=1024)."""
    from multi_modal_transformers_tokenmerge_tpu.ops.flash_attention import (
        flash_attention)
    from multi_modal_transformers_tokenmerge_tpu.sequence.layout import (
        SequenceLayout)

    layout = SequenceLayout.from_strings(
        "[TaskDescriptionPrefix{16}] "
        "[Image{100};Image{100};Image{100};Image{100};Image{100};"
        "Readout{4}]*2")
    s = layout.total_tokens
    mask_np = layout.attention_mask()
    mask = jnp.asarray(mask_np)
    qkv = jnp.stack([
        jax.random.normal(jax.random.PRNGKey(i),
                          (batch, s, heads, head_dim), dtype=jnp.bfloat16)
        for i in range(N_INPUTS)])

    def xla_attn(q, m):
        return jax.nn.dot_product_attention(q, q, q, mask=m[None, None])

    out = {"seq": s, "batch": batch, "heads": heads,
           "mask_density": round(float(mask_np.mean()), 3)}

    def xla_step(i, qkv, mask):
        q = jax.lax.dynamic_index_in_dim(qkv, i % qkv.shape[0],
                                         keepdims=False)
        return jnp.sum(xla_attn(q, mask).astype(jnp.float32))

    def flash_step(i, qkv):
        q = jax.lax.dynamic_index_in_dim(qkv, i % qkv.shape[0],
                                         keepdims=False)
        return jnp.sum(flash_attention(q, q, q, mask_np).astype(jnp.float32))

    fwd_xla = sec_per_call(build_loop(xla_step), (qkv, mask), "attnop_xla")
    fwd_flash = sec_per_call(build_loop(flash_step), (qkv,), "attnop_flash")
    out["forward_ms"] = {"xla": round(fwd_xla * 1e3, 3),
                         "flash": round(fwd_flash * 1e3, 3)}
    out["forward_flash_speedup"] = round(fwd_xla / fwd_flash, 3)

    def xla_grad_step(i, qkv, mask):
        q = jax.lax.dynamic_index_in_dim(qkv, i % qkv.shape[0],
                                         keepdims=False)
        g = jax.grad(lambda q: jnp.mean(
            jnp.square(xla_attn(q, mask).astype(jnp.float32))))(q)
        return jnp.sum(g.astype(jnp.float32))

    def flash_grad_step(i, qkv, backward):
        q = jax.lax.dynamic_index_in_dim(qkv, i % qkv.shape[0],
                                         keepdims=False)
        g = jax.grad(lambda q: jnp.mean(jnp.square(
            flash_attention(q, q, q, mask_np,
                            backward=backward).astype(jnp.float32))))(q)
        return jnp.sum(g.astype(jnp.float32))

    g_xla = sec_per_call(build_loop(xla_grad_step), (qkv, mask),
                         "attnop_grad_xla")
    g_pallas = sec_per_call(
        build_loop(lambda i, qkv: flash_grad_step(i, qkv, "pallas")),
        (qkv,), "attnop_grad_flash_pallas")
    g_recomp = sec_per_call(
        build_loop(lambda i, qkv: flash_grad_step(i, qkv, "xla")),
        (qkv,), "attnop_grad_flash_recompute")
    out["grad_ms"] = {"xla": round(g_xla * 1e3, 3),
                      "flash_pallas": round(g_pallas * 1e3, 3),
                      "flash_recompute": round(g_recomp * 1e3, 3)}
    out["grad_flash_speedup"] = round(g_xla / g_pallas, 3)
    log(f"[bench] attention op @{s}: fwd {out['forward_ms']} "
        f"grad {out['grad_ms']}")
    return out


def main_decomp():
    """Per-stage device-time decomposition of the octo_base bf16 forward
    (BENCH_DECOMP=1): text tower / image tokenizer+transformer / DDPM
    sampler, each timed with the fori_loop slope protocol."""
    from multi_modal_transformers_tokenmerge_tpu.core.yaml_loader import (
        load_config)
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo

    peak, kind = device_peak_flops()
    cfg = load_config("octo_base", ["dtype=bfloat16"])
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((BATCH, 16), dtype=jnp.int32)
    rng = np.random.default_rng(0)
    images_stack = jnp.asarray(
        rng.integers(0, 256, (N_INPUTS, BATCH, 2, 280, 280, 3)),
        dtype=jnp.float32)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        text, images_stack[0])
    text_emb = jax.jit(
        lambda v, t: model.apply(v, t, method="encode_text"))(variables, text)
    readouts = jax.jit(
        lambda v, te, im: model.apply(v, te, im,
                                      method="generate_readouts_with_text")
    )(variables, text_emb, images_stack[0])

    def text_step(i, variables, text, key):
        out = model.apply(variables, text + (i % 2), method="encode_text")
        return jnp.sum(out.astype(jnp.float32))

    def backbone_step(i, variables, text_emb, images_stack, key):
        img = jax.lax.dynamic_index_in_dim(images_stack,
                                           i % images_stack.shape[0],
                                           keepdims=False)
        out = model.apply(variables, text_emb, img,
                          method="generate_readouts_with_text")
        return jnp.sum(out.astype(jnp.float32))

    def sampler_step(i, variables, readouts, key):
        out = model.apply(
            variables, readouts + (i % 2).astype(readouts.dtype) * 1e-6,
            rngs={"diffusion": jax.random.fold_in(key, i)},
            method=lambda m, r: m.diffusion_action_head.predict_action(r))
        return jnp.sum(out.astype(jnp.float32))

    stages = {
        "text_tower": sec_per_call(
            build_loop(text_step), (variables, text, keys[3]), "text_tower"),
        "image_and_transformer": sec_per_call(
            build_loop(backbone_step),
            (variables, text_emb, images_stack, keys[3]), "backbone"),
        "ddpm_sampler_32": sec_per_call(
            build_loop(sampler_step), (variables, readouts, keys[3]),
            "sampler"),
    }
    total = sum(stages.values())
    print(json.dumps({
        "metric": "octo_base_bf16_forward_stage_ms",
        "value": round(total * 1e3, 3),
        "unit": "ms/call (sum of stages)",
        "vs_baseline": 1.0,
        "detail": {"batch": BATCH, "device": kind, "stage_ms": {
            k: round(v * 1e3, 3) for k, v in stages.items()},
            "stage_share": {k: round(v / total, 3)
                            for k, v in stages.items()}},
    }), flush=True)


def bench_deep():
    """Production-scale encoder stack (224 tokens, 12 blocks, 4x MLP):
    vanilla vs grouped ToMe, device-time protocol.  This is the regime the
    fork's named feature (token merging) is FOR — the committed octo_base
    config has num_blocks=1, so there ToMe has nothing to amortize
    (VERDICT r2 item 2); here it pays and the number is recorded in the
    driver-captured artifact."""
    from multi_modal_transformers_tokenmerge_tpu.core.config import (
        AttentionConfig, TransformerConfig)
    from multi_modal_transformers_tokenmerge_tpu.modules.attention import (
        TransformerStack)
    from multi_modal_transformers_tokenmerge_tpu.modules.tome_stack import (
        CompressedTransformerStack)
    from multi_modal_transformers_tokenmerge_tpu.sequence.layout import (
        SequenceLayout)

    layout = SequenceLayout.from_strings(
        "[TaskDescriptionPrefix{16}] [Image{100};Readout{4}]*2",
        "[TaskDescriptionPrefix{0}] [Image{32};Readout{0}]*2")
    s, e = layout.total_tokens, 768
    base = TransformerConfig(
        num_blocks=12,
        attention=AttentionConfig(num_heads=12, qkv_features=768,
                                  dropout_rate=0.0),
        mlp_dim=3072, dropout_rate=0.0)
    xs = jnp.stack([
        jax.random.normal(jax.random.PRNGKey(i), (BATCH, s, e),
                          dtype=jnp.bfloat16) for i in range(N_INPUTS)])
    mask = jnp.asarray(layout.attention_mask())

    vanilla = TransformerStack(base, dtype=jnp.bfloat16)
    vv = jax.jit(lambda key, x: vanilla.init(key, x, mask=mask))(
        jax.random.PRNGKey(1), xs[0])
    tome = CompressedTransformerStack(
        base.replace(compression_mode="merge", tome_merge_every=4),
        layout=layout, dtype=jnp.bfloat16)
    tv = jax.jit(tome.init)(jax.random.PRNGKey(1), xs[0])

    def vanilla_step(i, v, xs, mask):
        x = jax.lax.dynamic_index_in_dim(xs, i % xs.shape[0], keepdims=False)
        return jnp.sum(vanilla.apply(v, x, mask=mask).astype(jnp.float32))

    def tome_step(i, v, xs):
        x = jax.lax.dynamic_index_in_dim(xs, i % xs.shape[0], keepdims=False)
        return jnp.sum(tome.apply(v, x).astype(jnp.float32))

    res = {
        "vanilla": sec_per_call(build_loop(vanilla_step), (vv, xs, mask),
                                "deep_vanilla"),
        "tome": sec_per_call(build_loop(tome_step), (tv, xs), "deep_tome"),
    }
    return {
        "tokens": s, "blocks": 12, "mlp_dim": 3072, "batch": BATCH,
        "ms_per_call": {k: round(v * 1e3, 3) for k, v in res.items()},
        "sequences_per_sec_tome": round(BATCH / res["tome"], 2),
        "tome_speedup_vs_vanilla": round(res["vanilla"] / res["tome"], 3),
    }


def main_deep():
    _, kind = device_peak_flops()
    d = bench_deep()
    print(json.dumps({
        "metric": "deep_stack_sequences_per_sec_tome_224tok_12blk",
        "value": d["sequences_per_sec_tome"],
        "unit": "sequences/sec/chip",
        "vs_baseline": d["tome_speedup_vs_vanilla"],
        "detail": {"device": kind, **d},
    }), flush=True)


def main_deep_model():
    """End-to-end octo_deep preset (BENCH_DEEP_MODEL=1): the full
    production-scale ToMe flagship MODEL (224-token sequence, 12 blocks,
    4x MLP, T5 tower, diffusion head) vs the same model with compression
    off — the whole-model counterpart of main_deep()'s stack-only
    number.  Writes benchmarks/recorded/octo_deep_model_r4.json."""
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
    from multi_modal_transformers_tokenmerge_tpu.models.presets import (
        octo_deep)

    peak, kind = device_peak_flops()
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((BATCH, 16), dtype=jnp.int32)
    rng = np.random.default_rng(0)
    images_stack = jnp.asarray(
        rng.integers(0, 256, (N_INPUTS, BATCH, 2, 280, 280, 3)),
        dtype=jnp.float32)

    tome = octo_deep(dtype="bfloat16")
    vanilla = tome.replace(
        compression_sequence=None,
        transformer=tome.transformer.replace(compression_mode="none"))
    # round 5: the tokenizer-boundary merge (VERDICT r4 item 2) — one
    # extra event before stage 0, so the 200-token image block shrinks
    # BEFORE the first stage instead of only between stages
    prestack = tome.replace(
        transformer=tome.transformer.replace(prestack_merge=True))

    results = {}
    for name, cfg in (("vanilla", vanilla), ("tome", tome),
                      ("tome_prestack", prestack)):
        model = Octo(cfg)
        variables = jax.jit(model.init)(
            {"params": keys[0], "patch_encoding": keys[1],
             "dropout": keys[2], "diffusion": keys[3]},
            text, images_stack[0])
        single = jax.jit(
            lambda v, t, im, k, model=model: model.apply(
                v, t, im, rngs={"diffusion": k},
                method="predict_diffusion_action")
        ).lower(variables, text, images_stack[0], keys[3]).compile()
        flops = flops_of(single)
        sec = sec_per_call(
            build_loop(serve_step(model, "predict_diffusion_action")),
            (variables, text, images_stack, keys[3]), f"octo_deep_{name}")
        results[name] = {"ms_per_call": round(sec * 1e3, 3),
                         "inf_per_sec": round(BATCH / sec, 1),
                         "gflops_per_call": round(flops / 1e9, 1)
                         if flops else None}
        check_mfu(f"octo_deep_{name}", sec, flops, peak, results[name])
        log(f"[bench] octo_deep_{name}: {BATCH/sec:.0f} inf/s "
            f"({sec*1e3:.2f} ms/call, MFU {results[name].get('mfu', '?')})")

    best = ("tome_prestack"
            if results["tome_prestack"]["ms_per_call"]
            <= results["tome"]["ms_per_call"] else "tome")
    payload = {
        "metric": "octo_deep_model_inferences_per_sec_per_chip",
        "value": results[best]["inf_per_sec"],
        "unit": f"inferences/sec/chip (ToMe, {best})",
        "vs_baseline": round(results["vanilla"]["ms_per_call"]
                             / results[best]["ms_per_call"], 3),
        "detail": {"batch": BATCH, "device": kind, "variants": results,
                   "prestack_speedup_vs_vanilla": round(
                       results["vanilla"]["ms_per_call"]
                       / results["tome_prestack"]["ms_per_call"], 3),
                   "flops_caveat": (
                       "gflops/mfu are XLA cost-analysis values, which "
                       "count an nn.scan body ONCE — the vanilla variant "
                       "(one 12-block scan) is undercounted ~12x more "
                       "than the staged ToMe variant (3 scans), so only "
                       "ms_per_call comparisons are meaningful here")},
    }
    rec = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "benchmarks", "recorded")
    try:
        with open(os.path.join(rec, "octo_deep_model_r5.json"), "w") as f:
            f.write(json.dumps(payload) + "\n")
    except OSError as e:
        log(f"[bench] could not record octo_deep artifact: {e}")
    print(json.dumps(payload), flush=True)


def wait_for_backend(max_wait_s: float = None):
    """Block until the device backend answers (or the budget runs out).

    The axon TPU is time-shared behind a tunnel that can be unavailable
    for stretches; jax.devices() then either hangs or raises.  Polling in
    a subprocess (a hung in-process call cannot be cancelled) keeps the
    bench alive through an outage window instead of recording a failure.
    BENCH_WAIT_S overrides the budget (0 disables waiting).
    """
    import subprocess

    max_wait_s = float(os.environ.get("BENCH_WAIT_S", max_wait_s or 1800))
    if max_wait_s <= 0:
        return True  # waiting disabled — proceed without probing
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                capture_output=True, text=True,
                timeout=max(60.0, min(300.0, deadline - time.time())))
            up = probe.returncode == 0 and "ok" in probe.stdout
        except subprocess.TimeoutExpired:
            up = False
        if up:
            if attempt > 1:
                log(f"[bench] backend up after {attempt} probes")
            return True
        if time.time() >= deadline:
            log(f"[bench] backend still unavailable after {attempt} probes "
                f"({max_wait_s:.0f}s budget) — proceeding anyway")
            return False
        log(f"[bench] backend unavailable (probe {attempt}); retrying in 60s")
        time.sleep(60)


def emit_stale_recorded():
    """Last-resort output when the device backend never answers.

    An in-process jax call on a dead axon tunnel hangs forever, so
    proceeding would produce NO artifact at all.  Instead print the most
    recent recorded on-hardware artifact for this mode, tagged with
    explicit staleness provenance so the consumer knows it is a replay,
    not a fresh measurement.  Returns False when no recorded artifact
    exists (caller proceeds and takes its chances).
    """
    rec = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "benchmarks", "recorded")
    mode = "decomp" if DECOMP else ("multicam" if MULTICAM else "headline")
    try:
        with open(os.path.join(rec, "LATEST.json")) as f:
            name = json.load(f)[mode]
        with open(os.path.join(rec, name)) as f:
            best_payload = json.load(f)
    except (OSError, ValueError, KeyError):
        return False
    if "metric" not in best_payload or "value" not in best_payload:
        return False
    best_payload["stale"] = True
    best_payload["stale_reason"] = (
        "TPU backend unreachable for the full BENCH_WAIT_S budget; "
        "replaying the most recent recorded on-hardware artifact")
    print(compact_line(best_payload, name), flush=True)
    return True


if __name__ == "__main__":
    try:
        backend_up = wait_for_backend()
    except Exception as e:  # the wait is best-effort, never fatal
        log(f"[bench] backend wait skipped: {e}")
        backend_up = True
    if not backend_up and emit_stale_recorded():
        sys.exit(0)
    if DECOMP:
        main_decomp()
    elif DEEP:
        main_deep()
    elif os.environ.get("BENCH_DEEP_MODEL") == "1":
        main_deep_model()
    else:
        main()
