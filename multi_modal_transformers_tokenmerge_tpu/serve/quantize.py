"""Post-training int8 quantization for the frozen T5 text tower (serving).

The frozen text tower is the single biggest FLOP consumer of the obs->action
path at OCTO sequence lengths (BASELINE.md decomposition), and it is frozen
— no gradients ever flow through it (reference: tokenizers/text/t5_base.py
wraps it in stop_gradient) — which makes it the textbook target for
post-training quantization:

* **weights**: symmetric per-output-channel int8 (scale = amax/127 over the
  contraction axis), computed once from the trained params;
* **activations**: dynamic symmetric per-row int8 at call time;
* **dots**: ``lax.dot_general`` on int8 x int8 with int32 accumulation —
  the v5e MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS);
* everything else (RMSNorm, softmax, residuals, embeddings, position bias)
  stays in f32/bf16 exactly as the float tower.

``t5_encode_int8`` is a pure-jax forward over the quantized tree that
mirrors ``modules/t5.py:T5EncoderStack`` layer for layer; the parity test
(tests/test_quantize.py) holds the two implementations together.  Opt-in
serving feature — training and fidelity paths are untouched.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..modules.image_tokenizer import group_norm_stats_hwcn
from ..modules.t5 import relative_position_bucket
from ..ops.image_ops import eval_position_tokens, patchify

__all__ = ["QTensor", "quantize_matrix", "int8_matmul",
           "quantize_t5_params", "t5_encode_int8", "make_int8_text_encoder",
           "quantize_image_tower", "image_embed_int8", "image_embed_w8",
           "make_int8_image_embedder", "make_w8_image_embedder",
           "dequant", "matmul_w8", "matmul_w8_tn"]


@flax.struct.dataclass
class QTensor:
    """Symmetric per-output-channel int8 matrix: ``w ≈ q * scale``."""

    q: jax.Array      # (K, N) int8
    scale: jax.Array  # (N,) float32


def quantize_matrix(w: jax.Array) -> QTensor:
    """(K, N) float matrix -> int8 with per-column (output-channel) scales."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QTensor(q=q, scale=scale)


def int8_matmul(a: jax.Array, w: QTensor) -> jax.Array:
    """``a @ w`` with dynamic per-row int8 activation quantization.

    a: (..., K) float; returns (..., N) float32.  The int8 x int8 dot hits
    the MXU's double-rate byte path; quant/dequant are VPU elementwise ops
    XLA fuses into the surrounding computation.
    """
    a32 = a.astype(jnp.float32)
    amax = jnp.max(jnp.abs(a32), axis=-1, keepdims=True)
    a_scale = jnp.maximum(amax, 1e-8) / 127.0
    qa = jnp.clip(jnp.round(a32 / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        qa, w.q, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * a_scale * w.scale


def matmul_w8(a: jax.Array, w: QTensor,
              compute_dtype=jnp.bfloat16) -> jax.Array:
    """``a @ w`` with an int8-STORED kernel dequantized at call time
    (weight-only quantization): a (..., K) float x (K, N) int8 ->
    (..., N) float32.

    The batch-1 counterpart of :func:`int8_matmul`: at b1 the T5 tower's
    GEMMs are weight-read-bound, so fetching kernels as int8 halves their
    HBM traffic while activations stay float — no activation-quantization
    error and none of the per-call quant/dequant VPU work.  int8 values
    (<=127) are exact in bf16; the per-output-channel scale applies to
    the output, identical to scaling the kernel."""
    acc = jax.lax.dot_general(
        a.astype(compute_dtype), w.q.astype(compute_dtype),
        (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return acc * w.scale


def _q2d(kernel, k_dim: int) -> QTensor:
    """Quantize a (possibly stacked DenseGeneral) kernel as a 2-D matrix
    with ``k_dim`` contraction columns folded to axis 0."""
    k = kernel.reshape(k_dim, -1)
    return quantize_matrix(k)


def quantize_t5_params(t5_params) -> dict:
    """Convert a ``T5EncoderStack`` param tree (modules/t5.py) into the
    quantized serving tree consumed by :func:`t5_encode_int8`.

    Matmul kernels become :class:`QTensor`; embeddings, norm scales, and
    the relative-position bias table stay float.  Handles the nn.scan
    layer-stacked block leaves by vmapping the per-layer quantization.
    """
    p = t5_params
    blocks = p["blocks"]
    d_model = p["token_embedding"]["embedding"].shape[1]
    d_ff = blocks["wi"]["kernel"].shape[-1]
    # fused qkv kernel (modules/t5.py): (layers, d_model, 3, heads, d_kv).
    # The quantized tree keeps it FUSED — one int8 matmul instead of
    # three (the float tower's measured 1.09x, t5_qkv_r3.json) — and the
    # per-output-channel scales are per fused COLUMN, so each
    # projection's numerics are bit-identical to quantizing it separately
    h, dkv = blocks["attn"]["qkv"]["kernel"].shape[-2:]

    def per_layer(layer):
        qkv = layer["attn"]["qkv"]["kernel"]
        return {
            "attn_norm": layer["attn_norm"]["scale"],
            "mlp_norm": layer["mlp_norm"]["scale"],
            "qkv": _q2d(qkv, d_model),
            "o": _q2d(layer["attn"]["o"]["kernel"], h * dkv),
            "wi": _q2d(layer["wi"]["kernel"], d_model),
            "wo": _q2d(layer["wo"]["kernel"], d_ff),
        }

    return {
        "token_embedding": p["token_embedding"]["embedding"],
        "relative_attention_bias":
            p["relative_attention_bias"]["embedding"],
        "final_norm": p["final_norm"]["scale"],
        "layers": jax.vmap(per_layer)(blocks),
    }


def _rmsnorm(x, scale, epsilon=1e-6):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return x32 * jax.lax.rsqrt(var + epsilon) * scale.astype(jnp.float32)


def t5_encode_int8(qparams, token_ids, *, rel_pos_buckets: int = 32,
                   rel_pos_max_distance: int = 128,
                   dtype=jnp.bfloat16, unroll=True,
                   mode: str = "int8") -> jax.Array:
    """Quantized mirror of ``T5EncoderStack.__call__`` (modules/t5.py).

    Head geometry comes from array SHAPES (static even when the whole
    qparams tree is a jit argument): num_heads from the bias table's last
    axis, d_kv from the fused qkv matrix width.  ``unroll`` matches the
    float tower's full scan unroll (t5_scan_unroll=0 in the preset): at
    T=16 the per-layer matmuls are tiny and the rolled scan's dispatch
    dominated the r3 int8 tower's losing 0.80x.

    ``mode='int8'`` quantizes activations too (int8 x int8 MXU dots);
    ``mode='w8'`` is weight-only — kernels stored int8 but dequantized
    into ``dtype`` compute (:func:`matmul_w8`), no activation error.
    """
    if mode == "int8":
        mm = int8_matmul
    elif mode == "w8":
        def mm(a, w):
            return matmul_w8(a, w, compute_dtype=dtype)
    else:
        raise ValueError(f"unknown mode {mode!r}; 'int8' or 'w8'")
    h = qparams["relative_attention_bias"].shape[-1]
    dkv = qparams["layers"]["qkv"].q.shape[-1] // (3 * h)
    b, t = token_ids.shape

    x = jnp.take(qparams["token_embedding"], token_ids, axis=0).astype(dtype)

    pos = np.arange(t)
    buckets = relative_position_bucket(
        pos[None, :] - pos[:, None], num_buckets=rel_pos_buckets,
        max_distance=rel_pos_max_distance)
    bias_table = jnp.take(qparams["relative_attention_bias"],
                          jnp.asarray(buckets), axis=0)  # (T, T, H)
    position_bias = jnp.transpose(bias_table, (2, 0, 1))[None]  # (1,H,T,T)

    def block(x, layer):
        y = _rmsnorm(x, layer["attn_norm"]).astype(dtype)
        # one fused int8 qkv matmul (mirrors the float tower's fused
        # projection, modules/t5.py): (B, T, 3, H, D)
        qkv = mm(y, layer["qkv"]).reshape(b, t, 3, h, dkv)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + position_bias.astype(jnp.float32)
        weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v.astype(dtype))
        out = mm(out.reshape(b, t, h * dkv), layer["o"])
        x = x + out.astype(dtype)

        y = _rmsnorm(x, layer["mlp_norm"]).astype(dtype)
        y = jnp.maximum(mm(y, layer["wi"]), 0.0).astype(dtype)
        y = mm(y, layer["wo"])
        return (x + y.astype(dtype)), None

    x, _ = jax.lax.scan(block, x, qparams["layers"], unroll=unroll)
    return _rmsnorm(x, qparams["final_norm"]).astype(dtype)


# ---------------------------------------------------------------------------
# int8 image tower (the Gato patch embedder, modules/image_tokenizer.py)
# ---------------------------------------------------------------------------
#
# Rationale: after the hwcn layout fix the embedder's convs + output dense
# are MXU-BOUND (0.62-0.94 MFU, benchmarks/recorded/
# embedder_profile_hwcn_r3.json) and make up ~65% of the octo_base forward
# FLOPs — exactly the regime where the v5e MXU's 2x int8 byte path can pay
# (unlike the latency-bound text tower at batch 32, where it measured
# ~1.0x).  Weights are per-output-channel int8; activations are dynamic
# per-tensor int8; GroupNorm/GELU/pool and the position embeddings stay
# float, mirroring ResNetV2Embedder._call_hwcn (eval mode) exactly.


def quantize_conv_kernel(kernel) -> QTensor:
    """HWIO conv kernel -> int8 with per-output-channel scales."""
    k = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return QTensor(q=q, scale=scale)


def _quant_act_lanes(x):
    """Dynamic per-lane (last-axis element = one patch) int8 activation
    quantization: scale shape (N,) for (..., N) input."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=tuple(range(x.ndim - 1)))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_conv_hwcn(x, w: QTensor, strides, padding) -> jax.Array:
    """(H, W, C, N) float conv with int8 inputs (per-patch activation
    scales) and int32 accumulation."""
    qx, x_scale = _quant_act_lanes(x)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.q.shape, ("HWCN", "HWIO", "HWCN"))
    acc = jax.lax.conv_general_dilated(
        qx, w.q, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    # output channel axis is 2, patch (lane) axis is 3 in HWCN
    return acc.astype(jnp.float32) * (w.scale[:, None] * x_scale[None, :])


def int8_matmul_tn(a, w: QTensor) -> jax.Array:
    """(K, N) activations x (K, M) int8 kernel -> (N, M) float32, per-lane
    dynamic activation scales (TN dot: contraction on dim 0, no
    transpose)."""
    qa, a_scale = _quant_act_lanes(a)  # (K, N) with per-N scales
    acc = jax.lax.dot_general(qa, w.q, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * a_scale[:, None] * w.scale[None, :]


def dequant(w: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    """int8-stored tensor -> float, per-output-channel scales (last axis)."""
    return (w.q.astype(jnp.float32) * w.scale).astype(dtype)


def conv_w8_hwcn(x, w: QTensor, strides, padding,
                 compute_dtype=jnp.bfloat16) -> jax.Array:
    """(H, W, C, N) conv with an int8-STORED kernel dequantized at call
    time (weight-only quantization): compute runs in ``compute_dtype``
    exactly like the float tower, output float32.  The embedder's conv
    kernels are tiny (~30 KB) so the dequant is free; the mode exists for
    footprint symmetry with the dense below."""
    k = dequant(w, compute_dtype)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, k.shape, ("HWCN", "HWIO", "HWCN"))
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), k, strides, padding,
        dimension_numbers=dn, preferred_element_type=compute_dtype)
    return y.astype(jnp.float32)


def matmul_w8_tn(a, w: QTensor, compute_dtype=jnp.bfloat16) -> jax.Array:
    """(K, N) float activations x int8-STORED (K, M) kernel -> (N, M)
    float32 (TN dot, contraction on dim 0).

    Weight-only quantization for the weight-read-bound batch-1 regime:
    the kernel is fetched from HBM as int8 (half the bytes of bf16 — at
    octo_base's 28224x768 dense that is 21.7 MB/call saved) and converted
    tile-by-tile inside the dot's operand fusion; activations stay float,
    so there is no activation-quantization error.  The per-output-channel
    scale is applied to the (N, M) OUTPUT — mathematically identical to
    scaling the kernel, without materializing a float copy of it."""
    acc = jax.lax.dot_general(a.astype(compute_dtype),
                              w.q.astype(compute_dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return acc * w.scale[None, :]


def quantize_image_tower(model, variables) -> dict:
    """Pre-quantize an Octo model's ImageTokenizer params for
    :func:`image_embed_int8`."""
    p = variables["params"]["image_encoder"]
    rn = p["resnet"]
    cfg = model.config.images
    blocks = []
    for i in range(cfg.resnet.num_blocks):
        blocks.append({
            "norm_scale": rn[f"block{i}_norm"]["scale"],
            "norm_bias": rn[f"block{i}_norm"]["bias"],
            "conv": quantize_conv_kernel(rn[f"block{i}_conv"]["kernel"]),
            "conv_bias": rn[f"block{i}_conv"]["bias"],
        })
    return {
        "input_conv": quantize_conv_kernel(rn["input_conv"]["kernel"]),
        "input_bias": rn["input_conv"]["bias"],
        "blocks": blocks,
        "dense": quantize_matrix(
            rn["output_dense"]["kernel"].reshape(
                -1, cfg.resnet.output_features)),
        "dense_bias": rn["output_dense"]["bias"],
        "row_emb": p["row_position_embedding"]["embedding"],
        "col_emb": p["col_position_embedding"]["embedding"],
    }


def image_embed_int8(qparams, images, cfg, dtype=jnp.bfloat16) -> jax.Array:
    """Quantized eval-mode mirror of ``ImageTokenizer`` +
    ``ResNetV2Embedder._call_hwcn`` (modules/image_tokenizer.py): int8
    convs/dense (int8 activations too — the MXU's 2x byte path, the
    batch-32 throughput regime), float pool/GroupNorm/GELU, constant eval
    position tokens.

    cfg is the model's ``ImageTokenizerConfig``; images are
    (B, H, W, C) or (B, F, H, W, C) exactly as the float tower takes them.
    """
    return _image_embed_q(qparams, images, cfg, dtype,
                          int8_conv_hwcn, int8_matmul_tn)


def image_embed_w8(qparams, images, cfg, dtype=jnp.bfloat16) -> jax.Array:
    """Weight-only-int8 eval-mode mirror of the image tower: weights are
    STORED int8 (same ``quantize_image_tower`` tree as the int8 mode) but
    dequantized at call time and computed in bf16 — no activation
    quantization, so the output tracks the float tower to weight-rounding
    error only (~50x closer than the int8 mirror, tests/
    test_quantize_image.py).

    This is the BATCH-1 serving mode: at b1 the 28224x768 output dense is
    weight-read-bound and fetching the kernel as int8 halves its HBM
    traffic (measured 1.51x op-level on v5e, benchmarks/recorded/
    int8_gemm_r4.json 'dequant' row); at batch 32 the dense is
    compute-bound and bf16 stays (BASELINE.md regime table).
    """
    return _image_embed_q(
        qparams, images, cfg, dtype,
        lambda x, w, s, p: conv_w8_hwcn(x, w, s, p, compute_dtype=dtype),
        lambda a, w: matmul_w8_tn(a, w, compute_dtype=dtype))


def _image_embed_q(qparams, images, cfg, dtype, conv_fn, matmul_fn):
    rcfg = cfg.resnet
    if images.ndim == 4:
        images = images[:, None]
    b, f, hh, ww, ch = images.shape
    p = cfg.patch_size
    num_patches = (hh // p) * (ww // p)
    g = f * num_patches

    patches = patchify(images, p, cfg.normalize, dtype=jnp.float32)
    xt = jnp.transpose(patches.reshape(b * g, p, p, ch), (1, 2, 3, 0))

    y = conv_fn(xt, qparams["input_conv"],
                tuple(rcfg.input_stride), "VALID")
    y = y + qparams["input_bias"].astype(jnp.float32)[:, None]
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (*rcfg.pool_window, 1, 1),
        (*rcfg.pool_stride, 1, 1), "VALID")

    residual = y
    for blk in qparams["blocks"]:
        # stats math shared with the float tower so numerical fixes
        # (e.g. the var>=0 clamp) apply to both once
        y = group_norm_stats_hwcn(y, rcfg.group_norm_groups,
                                  rcfg.group_norm_epsilon,
                                  rcfg.norm_stats_scope, g)
        y = (y * blk["norm_scale"].astype(jnp.float32)[:, None]
             + blk["norm_bias"].astype(jnp.float32)[:, None])
        y = jax.nn.gelu(y)
        y = conv_fn(y, blk["conv"], (1, 1), "SAME")
        y = y + blk["conv_bias"].astype(jnp.float32)[:, None]
    y = y + residual

    h2, w2, c2, bg = y.shape
    out = matmul_fn(y.reshape(h2 * w2 * c2, bg), qparams["dense"])
    out = out + qparams["dense_bias"].astype(jnp.float32)
    emb = out.reshape(b, g, rcfg.output_features)

    r_np, c_np = eval_position_tokens(hh, p, cfg.position_interval)
    rows = jnp.tile(jnp.asarray(r_np), f)
    cols = jnp.tile(jnp.asarray(c_np), f)
    emb = (emb + jnp.take(qparams["row_emb"], rows, axis=0)[None]
           + jnp.take(qparams["col_emb"], cols, axis=0)[None])
    return emb.astype(dtype)


def make_int8_image_embedder(model, variables, dtype=jnp.bfloat16):
    """Drop-in ``images -> (B, F*P, E)`` callable for the
    ``*_with_modalities`` serving methods / PolicyEngine."""
    qp = quantize_image_tower(model, variables)
    cfg = model.config.images

    def embed(images):
        return image_embed_int8(qp, images, cfg, dtype=dtype)

    return embed


def make_w8_image_embedder(model, variables, dtype=jnp.bfloat16):
    """Drop-in ``images -> (B, F*P, E)`` callable with weight-only-int8
    storage (see :func:`image_embed_w8`) — the batch-1 serving variant of
    :func:`make_int8_image_embedder`."""
    qp = quantize_image_tower(model, variables)
    cfg = model.config.images

    def embed(images):
        return image_embed_w8(qp, images, cfg, dtype=dtype)

    return embed


def make_int8_text_encoder(model, variables, dtype=jnp.bfloat16):
    """Build a drop-in ``token_ids -> embeddings`` callable from an Octo
    model whose text encoder is the frozen T5 tower — usable as the text
    stage ahead of the ``*_with_text`` serving methods or PolicyEngine's
    instruction cache."""
    cfg = model.config.text
    if cfg.kind != "t5":
        raise ValueError(
            f"int8 text tower needs a t5 text encoder, got {cfg.kind!r}")
    t5_params = variables["params"]["text_encoder"]["t5_encoder"]
    qp = quantize_t5_params(t5_params)

    def encode(token_ids):
        return t5_encode_int8(
            qp, token_ids, rel_pos_buckets=cfg.t5_rel_pos_buckets,
            rel_pos_max_distance=cfg.t5_rel_pos_max_distance, dtype=dtype)

    return encode
