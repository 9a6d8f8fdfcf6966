"""Fused Pallas DDPM reverse-sampling kernel.

The reference's sampler (reference: action_heads/diffusion.py:146-209) runs
DDPM algorithm 2 as 32 sequential denoiser applications.  Even with the
per-step-constant context hoisted out of the loop (heads/diffusion.py), the
XLA ``lax.scan`` still executes each step as a handful of separate tiny
ops — two sub-lane matmuls, the DDPM update, a clip — and at batch 1 the
per-op overhead dominates: measured 6.2 us/step on v5e while the FLOPs are
~12 K MACs (benchmarks/recorded/serving_b1_decomp_r3.json — the sampler is
50% of cached-text b1 serving latency).

This kernel runs the ENTIRE reverse loop inside one Pallas program with the
denoiser weights resident in VMEM:

* weights (A x H and H x A, ~2.3 MB bf16 at octo_base) are loaded once;
* per-step contexts (T, B, H) — time-projection + readout-projection sums,
  computed outside in one batched matmul — stream in as a VMEM block;
* per-step DDPM coefficients (c1, c2, c3) sit in SMEM;
* per-step Gaussian noise is precomputed OUTSIDE in one batched call that
  is bit-identical to the scan path's in-loop ``fold_in`` + ``normal``
  (vmap over the same step keys), so fused and scan samplers see the same
  randomness;
* the T-step ``fori_loop`` carries the (B, A) sample in registers/VMEM —
  no HBM traffic between steps.

Only the ``num_blocks == 1`` denoiser (every shipped config, reference
model_configs/action_heads/diffusion.yaml:88) is fused; deeper denoisers
fall back to the scan path in heads/diffusion.py.

Matmul dtype discipline matches the XLA path: inputs cast to the compute
dtype, f32 MXU accumulation, result cast back to compute dtype before bias
adds; the DDPM state update itself is f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_ddpm_sample"]

# VMEM budget for the streamed context block (T, bt, H); the weights and
# noise blocks are small next to it.
_CTX_BLOCK_BYTES = 6 * 1024 * 1024


def _sampler_kernel(coeff_ref, noisy_ref, ctx_ref, noise_ref,
                    wn_ref, bn_ref, wo_ref, bo_ref, o_ref, *,
                    num_steps: int, clip_value: float, compute_dtype,
                    ddim_x0clip: bool, ddim_eps_recompute: bool):
    wn = wn_ref[...]
    bn = bn_ref[...]
    wo = wo_ref[...]
    bo = bo_ref[...]

    def body(t, sample):
        x = sample.astype(compute_dtype)
        h = jnp.dot(x, wn, preferred_element_type=jnp.float32)
        h = jax.nn.relu(h.astype(compute_dtype) + bn + ctx_ref[t])
        eps = jnp.dot(h, wo, preferred_element_type=jnp.float32)
        eps = (eps.astype(compute_dtype) + bo).astype(jnp.float32)
        if ddim_x0clip:
            # DDIM (eta=0) with the clamped x0 prediction:
            # coeffs rows are (d1, d2, e1, e2); deterministic, noise unused
            x0 = coeff_ref[t, 0] * sample - coeff_ref[t, 1] * eps
            x0 = jnp.clip(x0, -clip_value, clip_value)
            if ddim_eps_recompute:
                # consistent-pair eps from the clamped x0 (see
                # heads/diffusion.py ddim_schedule docstring)
                eps = (coeff_ref[t, 0] * sample - x0) / coeff_ref[t, 1]
            sample = coeff_ref[t, 2] * x0 + coeff_ref[t, 3] * eps
        else:
            c1 = coeff_ref[t, 0]
            c2 = coeff_ref[t, 1]
            c3 = coeff_ref[t, 2]
            sample = c1 * (sample - c2 * eps) + c3 * noise_ref[t]
        return jnp.clip(sample, -clip_value, clip_value)

    o_ref[...] = jax.lax.fori_loop(0, num_steps, body, noisy_ref[...],
                                   unroll=True)


@functools.partial(jax.jit, static_argnames=("clip_value", "compute_dtype",
                                             "ddim_x0clip",
                                             "ddim_eps_recompute",
                                             "interpret"))
def fused_ddpm_sample(noisy, contexts, noise, coeffs, wn, bn, wo, bo, *,
                      clip_value: float, compute_dtype=jnp.bfloat16,
                      ddim_x0clip: bool = False,
                      ddim_eps_recompute: bool = False,
                      interpret: bool = False):
    """Run the full DDPM (or DDIM) reverse process in one Pallas kernel.

    Args:
      noisy:    (B, A) f32 initial Gaussian sample.
      contexts: (T, B, H) per-step denoiser context (time-projection +
                readout-projection), already in the compute dtype.
      noise:    (T, B, A) f32 per-step Gaussian noise (zeros for DDIM).
      coeffs:   f32 per-step scalars — (T, 3) DDPM rows (c1, c2, c3), or
                (T, 4) rows (d1, d2, e1, e2) when ``ddim_x0clip`` is set
                (deterministic DDIM with the clamped x0 prediction,
                heads/diffusion.py:ddim_schedule).  With
                ``ddim_eps_recompute`` the direction term re-derives eps
                from the clamped x0 (ddim_eps_mode='recompute').
      wn, bn:   first-layer noisy-action projection (A, H) and bias (H,).
      wo, bo:   output projection (H, A) and bias (A,).

    Returns (B, A) f32 actions.
    """
    num_steps, batch, hidden = contexts.shape
    action_dim = noisy.shape[-1]

    itemsize = jnp.dtype(compute_dtype).itemsize
    bt = max(1, _CTX_BLOCK_BYTES // (num_steps * hidden * itemsize))
    if bt >= 8:
        bt = (bt // 8) * 8
    bt = min(bt, batch)
    padded = pl.cdiv(batch, bt) * bt
    if padded != batch:
        pad = ((0, padded - batch),)
        noisy = jnp.pad(noisy, pad + ((0, 0),))
        contexts = jnp.pad(contexts, ((0, 0),) + pad + ((0, 0),))
        noise = jnp.pad(noise, ((0, 0),) + pad + ((0, 0),))

    kernel = functools.partial(
        _sampler_kernel, num_steps=num_steps, clip_value=clip_value,
        compute_dtype=compute_dtype, ddim_x0clip=ddim_x0clip,
        ddim_eps_recompute=ddim_eps_recompute)
    out = pl.pallas_call(
        kernel,
        grid=(padded // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # coeffs
            pl.BlockSpec((bt, action_dim), lambda i: (i, 0)),
            pl.BlockSpec((num_steps, bt, hidden), lambda i: (0, i, 0)),
            pl.BlockSpec((num_steps, bt, action_dim), lambda i: (0, i, 0)),
            pl.BlockSpec((action_dim, hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden, action_dim), lambda i: (0, 0)),
            pl.BlockSpec((1, action_dim), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, action_dim), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((padded, action_dim), jnp.float32),
        interpret=interpret,
    )(coeffs, noisy, contexts, noise,
      wn.astype(compute_dtype), bn.astype(compute_dtype).reshape(1, -1),
      wo.astype(compute_dtype), bo.astype(compute_dtype).reshape(1, -1))
    return out[:batch]
