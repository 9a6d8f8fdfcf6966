"""Pipeline parallelism: GPipe schedule over the pipe mesh axis must be
numerically identical to the sequential scanned stack — forward AND
gradients (the backward replays the ring in reverse)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from multi_modal_transformers_tokenmerge_tpu.core.config import (
    AttentionConfig,
    TransformerConfig,
)
from multi_modal_transformers_tokenmerge_tpu.modules.attention import (
    EncoderBlock,
)
from multi_modal_transformers_tokenmerge_tpu.parallel.pipeline import (
    pipelined_apply,
    split_stages,
)

# golden/fidelity/parallel suite: nightly lane (VERDICT r4 item 7)
pytestmark = pytest.mark.slow

B, S, E, LAYERS = 8, 6, 16, 8


@pytest.fixture(scope="module")
def setup():
    cfg = TransformerConfig(
        num_blocks=LAYERS,
        attention=AttentionConfig(num_heads=2, qkv_features=E,
                                  dropout_rate=0.0),
        mlp_dim=32, dropout_rate=0.0)
    block = EncoderBlock(cfg)
    mask = jnp.asarray(np.tril(np.ones((S, S), dtype=bool)))
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, E))

    one = block.init(jax.random.PRNGKey(1), x, mask, True)["params"]
    # stack LAYERS independent per-layer params like nn.scan does
    stacked = jax.tree.map(
        lambda leaf: jnp.stack([
            leaf * (1.0 + 0.05 * i) for i in range(LAYERS)]), one)

    def layer_fn(layer_params, h):
        out, _ = block.apply({"params": layer_params}, h, mask, True)
        return out

    def sequential(params, x):
        def body(h, layer_params):
            return layer_fn(layer_params, h), None
        out, _ = jax.lax.scan(body, x, params)
        return out

    return dict(layer_fn=layer_fn, sequential=sequential, stacked=stacked,
                x=x)


@pytest.mark.parametrize("stages,microbatches", [(4, 4), (8, 8), (2, 4)])
def test_pipeline_matches_sequential_forward(setup, stages, microbatches):
    mesh = Mesh(np.asarray(jax.devices()[:stages]), ("pipe",))
    stage_params = split_stages(setup["stacked"], stages)
    ref = setup["sequential"](setup["stacked"], setup["x"])
    out = pipelined_apply(setup["layer_fn"], stage_params, setup["x"],
                          mesh, microbatches)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_matches_sequential_gradients(setup):
    stages, microbatches = 4, 4
    mesh = Mesh(np.asarray(jax.devices()[:stages]), ("pipe",))

    def loss_seq(params, x):
        return jnp.mean(jnp.square(setup["sequential"](params, x)))

    def loss_pipe(params, x):
        out = pipelined_apply(setup["layer_fn"], split_stages(params, stages),
                              x, mesh, microbatches)
        return jnp.mean(jnp.square(out))

    g_ref = jax.grad(loss_seq)(setup["stacked"], setup["x"])
    g_pipe = jax.grad(loss_pipe)(setup["stacked"], setup["x"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
        g_ref, g_pipe)


def test_pipeline_rejects_bad_shapes(setup):
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
    with pytest.raises(ValueError, match="not divisible"):
        split_stages(setup["stacked"], 3)
    with pytest.raises(ValueError, match="not divisible"):
        pipelined_apply(setup["layer_fn"], split_stages(setup["stacked"], 4),
                        setup["x"], mesh, 3)


def test_pipeline_composes_with_data_parallelism(setup):
    """Combined PP x DP on a ('data', 'pipe') mesh: batch shards over
    'data', stages over 'pipe'; forward and gradients must equal the
    sequential single-device stack (shard_map's transpose inserts the
    data-axis grad psum)."""
    from jax.sharding import PartitionSpec as P  # noqa: F401

    stages, microbatches = 2, 2
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "pipe"))

    ref = setup["sequential"](setup["stacked"], setup["x"])
    out = pipelined_apply(setup["layer_fn"],
                          split_stages(setup["stacked"], stages),
                          setup["x"], mesh, microbatches,
                          data_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_seq(params, x):
        return jnp.mean(jnp.square(setup["sequential"](params, x)))

    def loss_pp_dp(params, x):
        y = pipelined_apply(setup["layer_fn"], split_stages(params, stages),
                            x, mesh, microbatches, data_axis="data")
        return jnp.mean(jnp.square(y))

    g_ref = jax.grad(loss_seq)(setup["stacked"], setup["x"])
    g = jax.grad(loss_pp_dp)(setup["stacked"], setup["x"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
        g, g_ref)

    with pytest.raises(ValueError, match="data axis"):
        pipelined_apply(setup["layer_fn"],
                        split_stages(setup["stacked"], stages),
                        setup["x"][:6], mesh, 6, data_axis="data")
