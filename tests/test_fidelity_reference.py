"""Numerical fidelity against the reference's executable functions:
patchify, eval-mode position encoding, and train-mode position-token
distribution bounds (reference: tokenizers/images/image_tokenizer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.ops.image_ops import (
    eval_position_tokens,
    patchify,
    position_interval_bounds,
    sample_position_tokens,
)

from ref_loader import load_ref_image_tokenizer

# golden/fidelity/parallel suite: nightly lane (VERDICT r4 item 7)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref():
    return load_ref_image_tokenizer()


@pytest.mark.parametrize("h,p,normalize", [(280, 56, True), (256, 64, False),
                                           (64, 32, True)])
def test_patchify_matches_reference(ref, h, p, normalize):
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.integers(0, 256, (h, h, 3)), dtype=jnp.float32)
    ref_patches = np.asarray(ref.image_to_patches(image, p, normalize))
    ours = np.asarray(patchify(image, p, normalize))
    np.testing.assert_allclose(ours, ref_patches, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("h,p,interval", [(280, 56, 128), (256, 64, 128),
                                          (64, 32, 16)])
def test_eval_position_tokens_match_reference(ref, h, p, interval):
    image = jnp.zeros((h, h, 3))
    ref_rows, ref_cols = ref.encode_patch_position(
        image, None, p, interval, train=False)
    rows, cols = eval_position_tokens(h, p, interval)
    np.testing.assert_array_equal(rows, np.asarray(ref_rows))
    np.testing.assert_array_equal(cols, np.asarray(ref_cols))


def test_train_position_tokens_share_reference_support(ref):
    """Train-mode sampling: same per-patch interval support as the
    reference's sampler (keys differ, distributions must match)."""
    h, p, interval = 280, 56, 128
    image = jnp.zeros((h, h, 3))
    key = jax.random.PRNGKey(0)
    ref_rows, ref_cols = ref.encode_patch_position(
        image, key, p, interval, train=True)
    rs, rp, cs, cp = position_interval_bounds(h, p, interval)
    ref_rows, ref_cols = np.asarray(ref_rows), np.asarray(ref_cols)
    assert (ref_rows >= rs).all() and (ref_rows < rp).all()
    assert (ref_cols >= cs).all() and (ref_cols < cp).all()

    rows, cols = sample_position_tokens(key, (1,), h, p, interval)
    rows, cols = np.asarray(rows[0]), np.asarray(cols[0])
    assert (rows >= rs).all() and (rows < rp).all()
    assert (cols >= cs).all() and (cols < cp).all()
