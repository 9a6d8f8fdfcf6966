"""Diffusion head: schedule correctness, sampler determinism, and
hoisted-context equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_transformers_tokenmerge_tpu.core.config import (
    DiffusionHeadConfig,
)
from multi_modal_transformers_tokenmerge_tpu.heads.diffusion import (
    DiffusionActionHead,
    OctoDenoise,
    cosine_beta_schedule,
)


def test_cosine_schedule_matches_reference_formula():
    """The schedule must match the reference's jnp computation
    (diffusion.py:17-27) evaluated in numpy."""
    t_steps = 32
    betas = cosine_beta_schedule(t_steps)
    steps = t_steps + 1
    t = np.linspace(0, t_steps, steps) / t_steps
    ac = np.cos((t + 0.008) / 1.008 * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    expected = np.clip(1 - ac[1:] / ac[:-1], 0, 0.999)
    np.testing.assert_allclose(betas, expected, rtol=1e-6)
    assert (betas > 0).all() and (betas < 1).all()
    assert betas[-1] > betas[0]  # monotone-ish increasing noise


def _cfg(**kw):
    return DiffusionHeadConfig(diffusion_steps=4, action_space_dim=4,
                               time_dim=16, mlp_dim=32, **kw)


def test_hoisted_context_equals_direct_call():
    """denoise_from_context(static_context(...)) == __call__ — the sampler's
    hoisting must not change the math."""
    cfg = _cfg()
    m = OctoDenoise(cfg)
    noisy = jax.random.normal(jax.random.PRNGKey(0), (3, 4))
    time = jnp.full((3, 1), 2.0)
    readout = jax.random.normal(jax.random.PRNGKey(1), (3, 16))
    v = m.init(jax.random.PRNGKey(2), noisy, time, readout)

    direct = m.apply(v, noisy, time, readout)

    def hoisted(m2, noisy, time, readout):
        ctx = m2.static_context(m2.encode_time(time), readout)
        return m2.denoise_from_context(noisy, ctx)

    split = m.apply(v, noisy, time, readout, method=hoisted)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(split),
                               rtol=1e-6, atol=1e-6)


def test_sampler_deterministic_given_key():
    cfg = _cfg()
    head = DiffusionActionHead(cfg)
    readouts = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16))
    v = head.init({"params": jax.random.PRNGKey(1),
                   "diffusion": jax.random.PRNGKey(2)},
                  readouts, method="predict_action")
    a = head.apply(v, readouts, method="predict_action",
                   rngs={"diffusion": jax.random.PRNGKey(5)})
    b = head.apply(v, readouts, method="predict_action",
                   rngs={"diffusion": jax.random.PRNGKey(5)})
    c = head.apply(v, readouts, method="predict_action",
                   rngs={"diffusion": jax.random.PRNGKey(6)})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    assert np.abs(np.asarray(a)).max() <= cfg.clip_value


def test_sampler_folded_noise_varies_per_step():
    """'folded' mode must inject different noise per step (the reference
    reuses identical noise — its key-reuse bug)."""
    # high clip so untrained-weight drift doesn't saturate both runs at the
    # clip bounds and mask the noise-schedule difference
    cfg = _cfg(sampler_rng_mode="reference", clip_value=1e6)
    cfg_fixed = _cfg(sampler_rng_mode="folded", clip_value=1e6)
    head_ref = DiffusionActionHead(cfg)
    head_fix = DiffusionActionHead(cfg_fixed)
    readouts = jnp.zeros((1, 3, 16))
    v = head_ref.init({"params": jax.random.PRNGKey(1),
                       "diffusion": jax.random.PRNGKey(2)},
                      readouts, method="predict_action")
    a = head_ref.apply(v, readouts, method="predict_action",
                       rngs={"diffusion": jax.random.PRNGKey(3)})
    b = head_fix.apply(v, readouts, method="predict_action",
                       rngs={"diffusion": jax.random.PRNGKey(3)})
    # both run, both finite, but they differ (different noise schedules)
    assert np.isfinite(np.asarray(a)).all()
    assert np.isfinite(np.asarray(b)).all()
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_denoise_loss_finite_and_positive():
    cfg = _cfg()
    head = DiffusionActionHead(cfg)
    readouts = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16))
    actions = jnp.full((2, 4), 0.5)
    v = head.init({"params": jax.random.PRNGKey(1),
                   "diffusion": jax.random.PRNGKey(2)},
                  readouts, actions, method="denoise_loss")
    loss = head.apply(v, readouts, actions, method="denoise_loss",
                      rngs={"diffusion": jax.random.PRNGKey(3),
                            "dropout": jax.random.PRNGKey(4)})
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_final_step_noise_gated_per_algorithm_2():
    """DDPM algorithm 2 sets z = 0 at the final (t=0) reverse step: the
    default sampler modes emit no irreducible noise on the served action.
    'reference' mode keeps the reference's t=0 noise for bit-fidelity."""
    head = DiffusionActionHead(_cfg())
    times = jnp.arange(4)
    c3 = head.apply({"params": {}}, times, method="noise_coefficient")
    betas = cosine_beta_schedule(4)
    assert float(c3[0]) == 0.0
    np.testing.assert_allclose(np.asarray(c3[1:]), np.sqrt(betas[1:]),
                               rtol=1e-6)

    ref_head = DiffusionActionHead(_cfg(sampler_rng_mode="reference"))
    c3_ref = ref_head.apply({"params": {}}, times,
                            method="noise_coefficient")
    np.testing.assert_allclose(np.asarray(c3_ref), np.sqrt(betas), rtol=1e-6)


def test_fourier_dropout_follows_train_mode():
    """The FourierFeatures MLP's declared dropout must follow train mode
    (previously it was unconditionally deterministic — dead config)."""
    den = OctoDenoise(_cfg(dropout_rate=0.5))
    noisy = jnp.ones((8, 4))
    t = jnp.ones((8, 1))
    readout = jnp.ones((8, 16))
    v = den.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)}, noisy, t, readout)
    eval_out = den.apply(v, noisy, t, readout, True)
    train1 = den.apply(v, noisy, t, readout, False,
                       rngs={"dropout": jax.random.PRNGKey(2)})
    train2 = den.apply(v, noisy, t, readout, False,
                       rngs={"dropout": jax.random.PRNGKey(3)})
    # eval is deterministic; train draws differ across dropout keys
    np.testing.assert_array_equal(
        np.asarray(eval_out),
        np.asarray(den.apply(v, noisy, t, readout, True)))
    assert np.abs(np.asarray(train1) - np.asarray(train2)).max() > 0
