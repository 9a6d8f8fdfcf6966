"""DDPM diffusion action head (reference: action_heads/diffusion.py).

TPU-first differences from the reference:

* the denoiser's first layer splits the reference's
  ``Dense(concat(noisy, time_emb, readout))`` (diffusion.py:61-63) into
  three projections — ``W_n @ noisy + W_t @ time_emb + W_r @ readout`` —
  mathematically the same affine map, but it lets the sampler hoist
  everything that doesn't depend on the current sample OUT of the reverse
  loop: time embeddings and their projections for all T steps are computed
  in one batched matmul, the readout projection once.  Each of the 32
  sequential scan steps then only does the (B, A) x (A, H) noisy-action
  matmul — the sequential-latency floor drops by ~20x in FLOPs;
* the reverse process is a single jitted ``lax.scan`` whose carried PRNG
  key is ``fold_in``-ed per step (the reference reuses identical keys at
  every timestep — diffusion.py:178; ``sampler_rng_mode='reference'``
  reproduces that for fidelity testing);
* alphas / alpha-cumprods are numpy constants, not traced.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DiffusionHeadConfig
from ..modules.attention import MLPBlock, _bias_init, _kernel_init
from ..ops.ddpm_sampler import fused_ddpm_sample
from ..core.hw import on_tpu

__all__ = ["DiffusionActionHead", "OctoDenoise", "FourierFeatures",
           "cosine_beta_schedule", "ddim_schedule"]


def ddim_schedule(diffusion_steps: int, ddim_steps: int,
                  alphas_cumprod: np.ndarray):
    """Evenly subsampled DDIM (eta=0) schedule over a trained DDPM.

    Returns ``(taus, d1, d2, e1, e2)`` — descending timestep indices and
    the per-step update with a clamped x0 prediction, where
    ``p = alpha_hat[tau_prev]`` (1.0 after the final step) and
    ``h = alpha_hat[tau]``::

        x0_pred = d1 * x - d2 * eps          # = (x - sqrt(1-h)*eps)/sqrt(h)
        x0_pred = clip(x0_pred, +-clip_value)
        x_prev  = e1 * x0_pred + e2 * eps    # = sqrt(p)*x0 + sqrt(1-p)*eps

    The x0 clamp ("clip_denoised") is the standard DDIM stabilizer: the
    cosine schedule's last timestep has alpha_hat ~ 2.4e-6, so d1 ~ 645
    amplifies any denoiser error at the highest noise level; the action
    space is bounded (the reference clips samples to +-clip_value each
    DDPM step, diffusion.py:188), so the inferred clean action is clamped
    to the same bound.  When the clamp is inactive the update composes to
    the pure linear form ``x <- sqrt(p/h)*x + (sqrt(1-p) -
    sqrt(p/h)*sqrt(1-h))*eps``.

    When the clamp DOES engage, ``DiffusionHeadConfig.ddim_eps_mode``
    picks the eps used in the direction term: 'raw' keeps the denoiser's
    own eps (self-consistent with every recorded quality table);
    'recompute' re-derives ``eps' = (d1*x - x0_clipped) / d2`` — an
    algebraic rearrangement of ``eps' = (x - sqrt(h)*x0) / sqrt(1-h)`` —
    so the (x0, eps) pair stays consistent (guided-diffusion's
    clip_denoised convention).  The two coincide whenever the clamp is
    inactive.

    Deterministic (no per-step noise), so S denoiser applies replace the
    DDPM's ``diffusion_steps`` sequential steps at serving time.  The
    model itself is unchanged — eps comes from the same trained denoiser.
    """
    if not 1 <= ddim_steps <= diffusion_steps:
        raise ValueError(
            f"ddim_steps={ddim_steps} must be in [1, {diffusion_steps}]")
    taus = np.round(
        np.linspace(diffusion_steps - 1, 0, ddim_steps)).astype(np.int32)
    # S <= T gives linspace spacing >= 1, so rounded points are distinct
    assert len(np.unique(taus)) == len(taus)
    alpha = alphas_cumprod[taus]                       # (S,) descending t
    alpha_prev = np.append(alphas_cumprod[taus[1:]], 1.0)
    d1 = 1.0 / np.sqrt(alpha)
    d2 = np.sqrt(1.0 - alpha) / np.sqrt(alpha)
    e1 = np.sqrt(alpha_prev)
    e2 = np.sqrt(1.0 - alpha_prev)
    return (taus, d1.astype(np.float32), d2.astype(np.float32),
            e1.astype(np.float32), e2.astype(np.float32))


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine noise schedule (reference: diffusion.py:17-27), in numpy."""
    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps) / timesteps
    alphas_cumprod = np.cos((t + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


class FourierFeatures(nn.Module):
    """Learned Fourier time embedding + MLP (reference: diffusion.py:30-51)."""

    output_dim: int
    mlp_dim: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t, deterministic: bool = True):
        # (..., 1) float time values -> (..., output_dim)
        w = self.param("fourier_kernel", nn.initializers.he_normal(),
                       (self.output_dim // 2, t.shape[-1]), self.param_dtype)
        x = 2 * jnp.pi * t.astype(self.dtype) @ w.T.astype(self.dtype)
        x = jnp.concatenate([jnp.cos(x), jnp.sin(x)], axis=-1)
        x = MLPBlock(mlp_dim=self.mlp_dim, out_dim=self.output_dim,
                     dropout_rate=self.dropout_rate, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp")(
                         x, deterministic=deterministic)
        return x


class OctoDenoise(nn.Module):
    """Denoiser MLP over (noisy_action, time_emb, readout_emb)
    (reference: diffusion.py:53-65), with the first layer's input
    projection split by source (see module docstring)."""

    cfg: DiffusionHeadConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        dense = lambda feats, name, bias=True: nn.Dense(
            feats, use_bias=bias, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=_kernel_init,
            bias_init=_bias_init, name=name)
        self.time_encoder = FourierFeatures(
            output_dim=c.time_dim, mlp_dim=c.mlp_dim, dtype=self.dtype,
            param_dtype=self.param_dtype)
        # split first-layer projections (bias lives on the noisy branch)
        self.noisy_proj = dense(c.mlp_dim, "noisy_proj", bias=True)
        self.time_proj = dense(c.mlp_dim, "time_proj", bias=False)
        self.readout_proj = dense(c.mlp_dim, "readout_proj", bias=False)
        first_out = (c.action_space_dim if c.num_blocks == 1 else c.mlp_dim)
        self.first_out = dense(first_out, "first_out")
        self.dropout = nn.Dropout(c.dropout_rate)
        self.tail_blocks = [
            MLPBlock(mlp_dim=c.mlp_dim,
                     out_dim=(c.action_space_dim
                              if i == c.num_blocks - 2 else c.mlp_dim),
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name=f"mlp_{i + 1}")
            for i in range(c.num_blocks - 1)
        ]

    def encode_time(self, timestep, deterministic: bool = True):
        # (..., 1) -> (..., time_dim); deterministic follows train mode so
        # the FourierFeatures MLP's declared dropout is not silently inert
        # (the hoisted sampler calls keep the default: sampling never drops)
        return self.time_encoder(timestep, deterministic=deterministic)

    def static_context(self, time_emb, readout_emb):
        """The per-step-constant part of the first layer."""
        return (self.time_proj(time_emb.astype(self.dtype))
                + self.readout_proj(readout_emb.astype(self.dtype)))

    def denoise_from_context(self, noisy_action, context,
                             deterministic: bool = True):
        x = nn.relu(self.noisy_proj(noisy_action.astype(self.dtype))
                    + context)
        x = self.dropout(x, deterministic=deterministic)
        x = self.first_out(x)
        x = self.dropout(x, deterministic=deterministic)
        for blk in self.tail_blocks:
            x = blk(x, deterministic=deterministic)
        return x

    def __call__(self, noisy_action, timestep, readout_embedding,
                 deterministic: bool = True):
        ctx = self.static_context(self.encode_time(timestep, deterministic),
                                  readout_embedding)
        return self.denoise_from_context(noisy_action, ctx, deterministic)


class DiffusionActionHead(nn.Module):
    """DDPM action decoder (reference: diffusion.py:67-209)."""

    cfg: DiffusionHeadConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.denoiser = OctoDenoise(self.cfg, dtype=self.dtype,
                                    param_dtype=self.param_dtype)
        betas = cosine_beta_schedule(self.cfg.diffusion_steps)
        alphas = 1.0 - betas
        self._betas = jnp.asarray(betas, dtype=jnp.float32)
        self._alphas = jnp.asarray(alphas, dtype=jnp.float32)
        self._np_alpha_hats = np.cumprod(alphas)
        self._alpha_hats = jnp.asarray(self._np_alpha_hats,
                                       dtype=jnp.float32)

    def noise_coefficient(self, times):
        """Reverse-step noise coefficient c3 = sqrt(beta_t), with z = 0 at
        the final (t=0) step per DDPM algorithm 2 — no irreducible noise on
        the served action.  ``sampler_rng_mode='reference'`` keeps the
        reference's add-noise-at-t=0 behavior (diffusion.py:184-188) for
        bit-fidelity."""
        c3 = jnp.sqrt(self._betas[times])
        if self.cfg.sampler_rng_mode != "reference":
            c3 = jnp.where(times > 0, c3, jnp.zeros_like(c3))
        return c3

    def predict_denoise_term(self, readouts, time, noisy_actions,
                             train: bool = True):
        """(B, R, E) readouts, (B, 1) time, (B, A) noisy actions -> (B, A)."""
        embeddings = jnp.mean(readouts, axis=-2)
        return self.denoiser(noisy_actions, time, embeddings,
                             deterministic=not train)

    def denoise_loss(self, readouts, actions, train: bool = True):
        """L2 between predicted and true noise at a random timestep
        (reference: diffusion.py:110-143)."""
        batch_size = actions.shape[0]
        rng = self.make_rng(self.cfg.rng_collection)
        time_key, noise_key = jax.random.split(rng)

        time = jax.random.randint(time_key, (batch_size, 1), 0,
                                  self.cfg.diffusion_steps)
        noise = jax.random.normal(noise_key, actions.shape, dtype=jnp.float32)
        alpha_hat = self._alpha_hats[time]
        noisy_action = (jnp.sqrt(alpha_hat) * actions
                        + jnp.sqrt(1 - alpha_hat) * noise)

        pred = self.predict_denoise_term(readouts, time.astype(jnp.float32),
                                         noisy_action, train)
        loss = 0.5 * jnp.square(pred.astype(jnp.float32) - noise)
        return jnp.mean(jnp.sum(loss, axis=-1))

    def predict_action(self, readouts, train: bool = True):
        """Full reverse diffusion via one lax.scan
        (reference: diffusion.py:146-209, DDPM algorithm 2).

        Everything constant across steps — time embeddings, their
        projections, and the readout projection — is computed once before
        the loop (see OctoDenoise docstring)."""
        cfg = self.cfg
        batch_size = readouts.shape[0]
        rng = self.make_rng(cfg.rng_collection)
        init_key, loop_key = jax.random.split(rng)

        if cfg.sampler_rng_mode == "reference":
            # reference: one key per batch element, REUSED at every step
            keys = jax.random.split(rng, batch_size)
            noisy = jax.vmap(
                lambda k: jax.random.normal(k, (cfg.action_space_dim,)))(keys)
        else:
            keys = None
            noisy = jax.random.normal(
                init_key, (batch_size, cfg.action_space_dim))

        embeddings = jnp.mean(readouts, axis=-2)

        if self.is_initializing():
            # materialize denoiser params — the unbound applies below read
            # parameters, they cannot create them
            return self.denoiser(noisy, jnp.zeros((batch_size, 1)),
                                 embeddings)

        # unbind so the scan body applies the denoiser functionally
        # (flax modules cannot be re-entered inside raw lax.scan; the
        # reference uses the same pattern, diffusion.py:155)
        denoiser_mod, denoiser_vars = self.denoiser.unbind()

        # hoisted per-step constants: reverse-order times T-1 .. 0 (DDPM)
        # or the subsampled DDIM schedule
        if cfg.ddim_steps is not None:
            taus, dd1, dd2, de1, de2 = ddim_schedule(
                cfg.diffusion_steps, cfg.ddim_steps, self._np_alpha_hats)
            times = jnp.asarray(taus)
        else:
            times = jnp.arange(cfg.diffusion_steps - 1, -1, -1)
        time_embs = denoiser_mod.apply(
            denoiser_vars, times[:, None].astype(jnp.float32),
            method="encode_time")                           # (T, time_dim)
        time_part = denoiser_mod.apply(
            denoiser_vars, time_embs,
            method=lambda m, x: m.time_proj(x.astype(m.dtype)))   # (T, H)
        readout_part = denoiser_mod.apply(
            denoiser_vars, embeddings,
            method=lambda m, x: m.readout_proj(x.astype(m.dtype)))  # (B, H)
        contexts = time_part[:, None, :] + readout_part[None]  # (T, B, H)

        use_fused = cfg.num_blocks == 1 and (
            cfg.sampler_impl == "fused"
            or (cfg.sampler_impl == "auto"
                and on_tpu()))
        if cfg.ddim_steps is not None and cfg.ddim_eps_mode not in (
                "raw", "recompute"):
            raise ValueError(
                f"unknown ddim_eps_mode {cfg.ddim_eps_mode!r}; "
                f"'raw' or 'recompute'")
        if use_fused and cfg.ddim_steps is not None:
            # DDIM mode: per-step (d1, d2, e1, e2) with the in-kernel x0
            # clamp; deterministic, so the noise input is zeros
            coeffs = jnp.asarray(np.stack([dd1, dd2, de1, de2], axis=-1))
            noise_all = jnp.zeros(
                (len(taus), batch_size, cfg.action_space_dim), jnp.float32)
            p = denoiser_vars["params"]
            return fused_ddpm_sample(
                noisy.astype(jnp.float32), contexts, noise_all, coeffs,
                p["noisy_proj"]["kernel"], p["noisy_proj"]["bias"],
                p["first_out"]["kernel"], p["first_out"]["bias"],
                clip_value=cfg.clip_value, compute_dtype=self.dtype,
                ddim_x0clip=True,
                ddim_eps_recompute=cfg.ddim_eps_mode == "recompute",
                interpret=not on_tpu())

        if use_fused:
            # per-step noise, bit-identical to the in-scan computation
            if cfg.sampler_rng_mode == "reference":
                noise_b = jax.vmap(
                    lambda k: jax.random.normal(
                        k, (cfg.action_space_dim,)))(keys)
                noise_all = jnp.broadcast_to(
                    noise_b, (cfg.diffusion_steps,) + noise_b.shape)
            else:
                step_keys = jax.vmap(
                    lambda t: jax.random.fold_in(loop_key, t))(times)
                noise_all = jax.vmap(
                    lambda k: jax.random.normal(
                        k, (batch_size, cfg.action_space_dim)))(step_keys)
            coeffs = jnp.stack([
                1.0 / jnp.sqrt(self._alphas[times]),
                (1.0 - self._alphas[times])
                / jnp.sqrt(1.0 - self._alpha_hats[times]),
                self.noise_coefficient(times),
            ], axis=-1)                                        # (T, 3)
            p = denoiser_vars["params"]
            return fused_ddpm_sample(
                noisy.astype(jnp.float32), contexts, noise_all, coeffs,
                p["noisy_proj"]["kernel"], p["noisy_proj"]["bias"],
                p["first_out"]["kernel"], p["first_out"]["bias"],
                clip_value=cfg.clip_value, compute_dtype=self.dtype,
                interpret=not on_tpu())

        if cfg.ddim_steps is not None:
            eps_recompute = cfg.ddim_eps_mode == "recompute"

            def ddim_step(sample, xs):
                context, d1, d2, e1, e2 = xs
                eps = denoiser_mod.apply(
                    denoiser_vars, sample, context,
                    method="denoise_from_context").astype(jnp.float32)
                x0 = jnp.clip(d1 * sample - d2 * eps,
                              -cfg.clip_value, cfg.clip_value)
                if eps_recompute:
                    # consistent pair: eps' = (x - sqrt(h)*x0)/sqrt(1-h),
                    # rearranged with d1 = 1/sqrt(h), d2 = sqrt(1-h)/sqrt(h)
                    eps = (d1 * sample - x0) / d2
                sample = e1 * x0 + e2 * eps
                return jnp.clip(sample, -cfg.clip_value, cfg.clip_value), ()

            actions, _ = jax.lax.scan(
                ddim_step, noisy.astype(jnp.float32),
                (contexts, jnp.asarray(dd1), jnp.asarray(dd2),
                 jnp.asarray(de1), jnp.asarray(de2)))
            return actions

        def denoise_step(carry, xs):
            sample, key = carry
            time, context = xs
            denoise_term = denoiser_mod.apply(
                denoiser_vars, sample, context,
                method="denoise_from_context").astype(jnp.float32)

            if cfg.sampler_rng_mode == "reference":
                noise = jax.vmap(
                    lambda k: jax.random.normal(k, (cfg.action_space_dim,)))(
                        keys)
                next_key = key
            else:
                step_key = jax.random.fold_in(key, time)
                noise = jax.random.normal(
                    step_key, (batch_size, cfg.action_space_dim))
                next_key = key

            c1 = 1.0 / jnp.sqrt(self._alphas[time])
            c2 = (1.0 - self._alphas[time]) / jnp.sqrt(
                1.0 - self._alpha_hats[time])
            c3 = self.noise_coefficient(time)
            sample = c1 * (sample - c2 * denoise_term) + c3 * noise
            sample = jnp.clip(sample, -cfg.clip_value, cfg.clip_value)
            return (sample, next_key), ()

        (actions, _), _ = jax.lax.scan(
            denoise_step,
            (noisy.astype(jnp.float32), loop_key),
            (times, contexts),
        )
        return actions
