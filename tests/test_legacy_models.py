"""Tests for aux modules (pointcloud, offset attention, value tokenizer)
and the legacy model family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.models.legacy import (
    ConceptLearnerConfig,
    ConceptLearnerMetaLoss,
    ConceptPlanner,
    GatoConceptLearner,
    PointCloudTransformer,
    PointCloudTransformerConfig,
    SingleImageConceptLearner,
    VisualConceptPlanner,
    attention_importance,
)
from multi_modal_transformers_tokenmerge_tpu.modules.offset_attention import (
    OffsetAttention,
)
from multi_modal_transformers_tokenmerge_tpu.modules.pointcloud import (
    SampleAndGroup,
    farthest_point_sampling,
    knn,
    pairwise_sq_dist,
)
from multi_modal_transformers_tokenmerge_tpu.modules.value_tokenizer import (
    ActionTokenizer,
    mu_law_decode,
    mu_law_encode,
)


# ---- point cloud ----------------------------------------------------------

pytestmark = pytest.mark.slow

def test_pairwise_sq_dist():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(10, 3)).astype(np.float32)
    b = rng.normal(size=(7, 3)).astype(np.float32)
    d = np.asarray(pairwise_sq_dist(jnp.asarray(a), jnp.asarray(b)))
    expected = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, expected, rtol=1e-4, atol=1e-5)


def test_fps_spreads_points():
    """FPS on two well-separated clusters must sample from both."""
    rng = np.random.default_rng(1)
    c1 = rng.normal(size=(50, 3)) * 0.1
    c2 = rng.normal(size=(50, 3)) * 0.1 + 10.0
    pts = jnp.asarray(np.concatenate([c1, c2]), dtype=jnp.float32)
    idx = np.asarray(farthest_point_sampling(pts, 10, jax.random.PRNGKey(0)))
    assert len(np.unique(idx)) == 10  # no repeats
    assert (idx < 50).any() and (idx >= 50).any()  # both clusters hit


def test_knn_exact():
    pts = jnp.asarray(np.arange(20, dtype=np.float32)[:, None] * [1, 0, 0])
    centroids = pts[:2]
    nbrs = np.asarray(knn(pts, centroids, 3, exact=True))
    assert set(nbrs[0]) == {0, 1, 2}


def test_sample_and_group_shapes():
    pts = jax.random.normal(jax.random.PRNGKey(0), (100, 6))
    m = SampleAndGroup(num_samples=16, num_neighbours=8, embed_dim=32)
    v = m.init(jax.random.PRNGKey(1), pts, jax.random.PRNGKey(2))
    out = m.apply(v, pts, jax.random.PRNGKey(2))
    assert out.shape == (16, 3 + 32)  # xyz carried + pooled features


def test_point_cloud_transformer():
    cfg = PointCloudTransformerConfig(
        lbr_features=(16, 16), sample1=(32, 8, 32), sample2=(16, 8, 32),
        attention_heads=2, attention_layers=4)
    model = PointCloudTransformer(cfg)
    pts = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 3))
    v = model.init(jax.random.PRNGKey(1), pts, jax.random.PRNGKey(2))
    out = model.apply(v, pts, jax.random.PRNGKey(2))
    assert out.shape == (2, 16, 32 * 4)  # 4 concatenated attention outputs


# ---- offset attention / value tokenizer -----------------------------------

def test_offset_attention_shape():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    m = OffsetAttention(num_heads=2, qkv_features=16)
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == x.shape


def test_mu_law_roundtrip():
    x = jnp.linspace(-1, 1, 21)
    y = mu_law_encode(x)
    assert float(jnp.abs(y).max()) <= 1.0
    np.testing.assert_allclose(np.asarray(mu_law_decode(y)), np.asarray(x),
                               atol=1e-6)


def test_action_tokenizer():
    m = ActionTokenizer(num_actions=16, embedding_dim=8)
    a = jnp.asarray([[1, 2], [3, 4]])
    v = m.init(jax.random.PRNGKey(0), a)
    assert m.apply(v, a).shape == (2, 2, 8)


# ---- legacy models ---------------------------------------------------------

def _cl_cfg():
    return ConceptLearnerConfig()


def _rngs(n=3):
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    return {"params": keys[0], "patch_encoding": keys[1], "dropout": keys[2]}


def test_gato_concept_learner():
    cfg = _cl_cfg()
    model = GatoConceptLearner(cfg)
    text = jnp.ones((2, 8), dtype=jnp.int32)
    images = jnp.ones((2, cfg.max_seq_len, 64, 64, 3))
    actions = jnp.asarray([[3, 2, 0, 0], [1, 0, 0, 0]], dtype=jnp.int32)
    v = jax.jit(model.init)(_rngs(), text, images, actions)
    logits = model.apply(v, text, images, actions)
    assert logits.shape == (2, cfg.num_actions)


def test_single_image_concept_learner_and_attention_map():
    cfg = _cl_cfg()
    model = SingleImageConceptLearner(cfg)
    text = jnp.ones((2, 8), dtype=jnp.int32)
    images = jnp.ones((2, 64, 64, 3))
    v = jax.jit(model.init)(_rngs(), text, images)
    logits = model.apply(v, text, images)
    assert logits.shape == (2, cfg.num_actions)

    imp = attention_importance(model, v, text, images, layer=0)
    assert imp.shape == (2, 8 + 4)  # text + image tokens
    np.testing.assert_allclose(np.asarray(imp.sum(-1)), 1.0, rtol=1e-5)


def test_attention_importance_scanned_stack():
    """The probe also works for nn.scan'd stacks (TransformerStack),
    whose sown weights arrive as ONE stacked (num_blocks, B, H, Q, K)
    entry — previously dropped entirely because the scan did not declare
    the 'intermediates' collection (review finding)."""
    import flax.linen as nn

    from multi_modal_transformers_tokenmerge_tpu.core.config import (
        AttentionConfig, TransformerConfig)
    from multi_modal_transformers_tokenmerge_tpu.modules.attention import (
        TransformerStack)

    class TinyScanned(nn.Module):
        @nn.compact
        def __call__(self, text, images):
            t = nn.Embed(16, 16)(text)
            im = nn.Dense(16)(images.reshape(images.shape[0], 4, -1))
            x = jnp.concatenate([t, im], axis=1)
            cfg = TransformerConfig(
                num_blocks=2,
                attention=AttentionConfig(num_heads=2, qkv_features=16,
                                          dropout_rate=0.0),
                mlp_dim=32, dropout_rate=0.0)
            return TransformerStack(cfg, name="transformer")(x)

    model = TinyScanned()
    text = jnp.ones((2, 8), dtype=jnp.int32)
    images = jnp.ones((2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), text, images)

    imps = [attention_importance(model, v, text, images, layer=i)
            for i in range(2)]
    for imp in imps:
        assert imp.shape == (2, 8 + 4)
        np.testing.assert_allclose(np.asarray(imp.sum(-1)), 1.0, rtol=1e-5)
    # the layer index selects distinct layers from the stacked entry
    assert not np.allclose(np.asarray(imps[0]), np.asarray(imps[1]))

    with pytest.raises(ValueError, match="out of range"):
        attention_importance(model, v, text, images, layer=5)


def test_concept_learner_meta_loss():
    cfg = _cl_cfg()
    model = ConceptLearnerMetaLoss(cfg)
    text = jnp.ones((2, 8), dtype=jnp.int32)
    images = jnp.ones((2, 64, 64, 3))
    actions = jnp.asarray([1, 2], dtype=jnp.int32)
    v = jax.jit(model.init)(_rngs(), text, images, actions)
    loss = model.apply(v, text, images, actions)
    assert loss.shape == (2, 1)
    assert (np.asarray(loss) >= 0).all()


def test_concept_planner_generation():
    cfg = _cl_cfg()
    model = ConceptPlanner(cfg)
    images = jnp.ones((2, 64, 64, 3))
    text = jnp.zeros((2, 4), dtype=jnp.int32)
    v = jax.jit(model.init)(_rngs(), images, text)

    tok, lp, val = model.apply(v, images, text)
    assert tok.shape == (2,) and lp.shape == (2,) and val.shape == (2, 1)

    gen, log_probs, value = model.apply(
        v, images, method="predict_concept_and_value")
    assert gen.shape == (2, 4)
    assert gen.dtype == jnp.int32
    assert log_probs.shape == (2,)
    assert (np.asarray(log_probs) <= 0).all()


def test_visual_concept_planner_struct():
    vcp = VisualConceptPlanner(planner_state=1, learner_state=2)
    leaves = jax.tree.leaves(vcp)
    assert leaves == [1, 2]


def test_make_concept_learner_dispatch():
    from multi_modal_transformers_tokenmerge_tpu.models.legacy import (
        make_concept_learner)
    cfg = _cl_cfg()
    assert isinstance(make_concept_learner("v1", cfg), GatoConceptLearner)
    assert isinstance(make_concept_learner("v2", cfg),
                      SingleImageConceptLearner)
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        make_concept_learner("v3", cfg)
