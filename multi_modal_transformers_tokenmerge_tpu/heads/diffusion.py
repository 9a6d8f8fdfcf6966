"""DDPM diffusion action head (reference: action_heads/diffusion.py).

TPU-first differences from the reference:

* the 32-step reverse process is a single jitted ``lax.scan`` whose carried
  PRNG key is ``fold_in``-ed per step (the reference reuses the same keys at
  every timestep — diffusion.py:178 — which makes the sampler's noise
  identical across steps; ``sampler_rng_mode='reference'`` reproduces that
  behaviour for fidelity testing);
* alphas / alpha-cumprods are precomputed as numpy constants, not traced;
* the denoiser runs entirely inside the scan — one compiled step body.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DiffusionHeadConfig
from ..modules.attention import MLPBlock

__all__ = ["DiffusionActionHead", "OctoDenoise", "FourierFeatures",
           "cosine_beta_schedule"]


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
    def __call__(self, t):  # (B, 1) float time values
        w = self.param("fourier_kernel", nn.initializers.he_normal(),
                       (self.output_dim // 2, t.shape[-1]), self.param_dtype)
        x = 2 * jnp.pi * t.astype(self.dtype) @ w.T.astype(self.dtype)
        x = jnp.concatenate([jnp.cos(x), jnp.sin(x)], axis=-1)
        x = MLPBlock(mlp_dim=self.mlp_dim, out_dim=self.output_dim,
                     dropout_rate=self.dropout_rate, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp")(x)
        return x


class OctoDenoise(nn.Module):
    """Denoiser MLP: concat(noisy_action, time_emb, readout_emb) -> MLP
    blocks (reference: diffusion.py:53-65)."""

    cfg: DiffusionHeadConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, noisy_action, timestep, readout_embedding):
        time_emb = FourierFeatures(output_dim=self.cfg.time_dim,
                                   mlp_dim=self.cfg.mlp_dim,
                                   dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="time_encoder")(timestep)
        x = jnp.concatenate(
            [noisy_action.astype(self.dtype), time_emb,
             readout_embedding.astype(self.dtype)], axis=-1)
        for i in range(self.cfg.num_blocks):
            out_dim = (self.cfg.action_space_dim
                       if i == self.cfg.num_blocks - 1 else self.cfg.mlp_dim)
            x = MLPBlock(mlp_dim=self.cfg.mlp_dim, out_dim=out_dim,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"mlp_{i}")(x)
        return x


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
        self._alpha_hats = jnp.asarray(np.cumprod(alphas), dtype=jnp.float32)

    def predict_denoise_term(self, readouts, time, noisy_actions,
                             train: bool = True):
        """(B, R, E) readouts, (B, 1) time, (B, A) noisy actions -> (B, A)."""
        embeddings = jnp.mean(readouts, axis=-2)
        return self.denoiser(noisy_actions, time, embeddings)

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
        """Full reverse-diffusion sampling via one lax.scan
        (reference: diffusion.py:146-209, DDPM algorithm 2)."""
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

        # condition once; reused every step
        embeddings = jnp.mean(readouts, axis=-2)

        def denoise_step(carry, time):
            sample, key = carry
            time_f = jnp.full((batch_size, 1), time, dtype=jnp.float32)
            denoise_term = self.denoiser(sample, time_f, embeddings)
            denoise_term = denoise_term.astype(jnp.float32)

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
            c3 = jnp.sqrt(self._betas[time])
            sample = c1 * (sample - c2 * denoise_term) + c3 * noise
            sample = jnp.clip(sample, -cfg.clip_value, cfg.clip_value)
            return (sample, next_key), ()

        (actions, _), _ = jax.lax.scan(
            denoise_step,
            (noisy.astype(jnp.float32), loop_key),
            jnp.arange(cfg.diffusion_steps - 1, -1, -1),
        )
        return actions
