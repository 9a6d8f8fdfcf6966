"""Frozen end-to-end regression goldens: eval-mode octo_micro outputs under
fixed seeds must stay bit-stable across refactors (guards numerics for
future rounds).  Regenerate intentionally with:
    python tests/test_regression_golden.py regen
"""

import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
from multi_modal_transformers_tokenmerge_tpu.core.config import (
    TransformerConfig)

from micro_configs import octo_micro

# golden/fidelity/parallel suite: nightly lane (VERDICT r4 item 7)
pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "octo_micro_eval.npz")


def _outputs():
    cfg = octo_micro()
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(1234), 4)
    text = (jnp.arange(8, dtype=jnp.int32).reshape(2, 4) * 5) % 64
    images = jnp.asarray(
        np.linspace(0, 255, 2 * 64 * 64 * 3, dtype=np.float32).reshape(
            2, 64, 64, 3))
    v = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images)
    cont = model.apply(v, text, images, method="predict_continuous_action")
    logits = model.apply(v, text, images, method="predict_action_logits")
    diff = model.apply(v, text, images, method="predict_diffusion_action",
                       rngs={"diffusion": keys[3]})
    readouts = model.apply(v, text, images, method="generate_readouts")
    return {"continuous": np.asarray(cont), "logits": np.asarray(logits),
            "diffusion": np.asarray(diff), "readouts": np.asarray(readouts)}


def test_eval_outputs_match_golden():
    assert os.path.exists(GOLDEN), (
        "golden file missing; run: python tests/test_regression_golden.py regen")
    golden = np.load(GOLDEN)
    outs = _outputs()
    for name in golden.files:
        np.testing.assert_allclose(
            outs[name], golden[name], rtol=1e-5, atol=1e-5,
            err_msg=f"output {name!r} drifted from golden")


def test_remat_matches_no_remat():
    """Rematerialized encoder stack must be numerically identical."""
    cfg = octo_micro()
    model = Octo(cfg)
    cfg_remat = cfg.replace(transformer=cfg.transformer.replace(remat=True))
    model_r = Octo(cfg_remat)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((2, 4), dtype=jnp.int32)
    images = jnp.ones((2, 64, 64, 3))
    v = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images)
    a = model.apply(v, text, images, method="predict_continuous_action")
    b = model_r.apply(v, text, images, method="predict_continuous_action")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # gradients flow through the remat stack too
    def loss(params):
        return jnp.mean(model_r.apply(
            {"params": params}, text, images, jnp.full((2, 4), 0.2),
            rngs={"dropout": keys[2], "patch_encoding": keys[1]},
            method="compute_l2_loss"))

    g = jax.grad(loss)(v["params"])
    assert sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)) > 0


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **_outputs())
        print(f"wrote {GOLDEN}")
