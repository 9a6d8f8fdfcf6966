"""Ring attention (context parallelism): sequence-sharded attention over a
ring of devices must equal full single-device attention — forward AND
gradients — for dense, causal, and OCTO block-causal masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from multi_modal_transformers_tokenmerge_tpu.parallel.ring_attention import (
    ring_attention,
)
from multi_modal_transformers_tokenmerge_tpu.sequence.layout import (
    SequenceLayout,
)

# golden/fidelity/parallel suite: nightly lane (VERDICT r4 item 7)
pytestmark = pytest.mark.slow

B, S, H, D = 2, 64, 2, 8


def _reference(q, k, v, mask):
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = jnp.where(jnp.asarray(mask)[None, None], s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v.astype(jnp.float32))


def _qkv(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (B, S, H, D)) for k in ks)


def _masks():
    octo = SequenceLayout.from_strings(
        "[TaskDescriptionPrefix{8}] [Image{10};Readout{4}]*4")
    assert octo.total_tokens == S
    return {
        "dense": np.ones((S, S), dtype=bool),
        "causal": np.tril(np.ones((S, S), dtype=bool)),
        "octo_block_causal": octo.attention_mask(),
    }


@pytest.mark.parametrize("ring", [2, 4, 8])
@pytest.mark.parametrize("mask_name", sorted(_masks()))
def test_ring_matches_full_attention(ring, mask_name):
    mask = _masks()[mask_name]
    mesh = Mesh(np.asarray(jax.devices()[:ring]), ("seq",))
    q, k, v = _qkv()
    ref = _reference(q, k, v, mask)
    out = ring_attention(q, k, v, mask, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_gradients_match_full_attention():
    mask = _masks()["octo_block_causal"]
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("seq",))
    q, k, v = _qkv(1)

    def loss_ref(q, k, v):
        return jnp.mean(jnp.square(_reference(q, k, v, mask)))

    def loss_ring(q, k, v):
        return jnp.mean(jnp.square(
            ring_attention(q, k, v, mask, mesh).astype(jnp.float32)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


def test_ring_rejects_indivisible_sequence():
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("seq",))
    q, k, v = _qkv()
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q[:, :63], k[:, :63], v[:, :63],
                       np.ones((63, 63), dtype=bool), mesh)


def test_ring_under_jit_with_fsdp_style_batch():
    """jit composes: ring attention inside a jitted fn with inputs placed
    sequence-sharded on the mesh."""
    mask = _masks()["causal"]
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("seq",))
    q, k, v = _qkv(2)

    fn = jax.jit(lambda q, k, v: ring_attention(q, k, v, mask, mesh))
    out = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_reference(q, k, v, mask)),
                               rtol=2e-5, atol=2e-5)


def test_ring_fully_masked_rows_emit_zeros():
    """Rows whose mask forbids every key must come out as zeros (matching
    the flash kernel's padding behavior), not the unmasked mean of V."""
    mask = np.tril(np.ones((S, S), dtype=bool))
    mask[5] = False       # a dead row in the first shard
    mask[S - 3] = False   # and one in the last
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("seq",))
    q, k, v = _qkv(3)
    out = np.asarray(ring_attention(q, k, v, mask, mesh))
    np.testing.assert_array_equal(out[:, 5], 0.0)
    np.testing.assert_array_equal(out[:, S - 3], 0.0)
    # live rows still match the reference on the same mask
    ref = np.asarray(_reference(q, k, v, mask))
    live = [i for i in range(S) if i not in (5, S - 3)]
    np.testing.assert_allclose(out[:, live], ref[:, live],
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# flash-kernel inner op (VERDICT r2 item 3): same contracts, Pallas path
# ---------------------------------------------------------------------------

SF = 512  # tile-aligned shard lengths: ring 2 -> 256, ring 4 -> 128


def _qkv_f(seed=0, s=SF):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (1, s, H, D)) for k in ks)


def _octo_mask_f():
    layout = SequenceLayout.from_strings(
        "[TaskDescriptionPrefix{32}] [Image{100};Readout{20}]*4")
    assert layout.total_tokens == SF
    return layout.attention_mask()


@pytest.mark.slow
@pytest.mark.parametrize("ring", [2, 4])
@pytest.mark.parametrize("mask_name", ["causal", "octo"])
def test_ring_flash_matches_full_attention(ring, mask_name):
    mask = (np.tril(np.ones((SF, SF), dtype=bool)) if mask_name == "causal"
            else _octo_mask_f())
    mesh = Mesh(np.asarray(jax.devices()[:ring]), ("seq",))
    q, k, v = _qkv_f()
    out = ring_attention(q, k, v, mask, mesh, impl="flash", interpret=True)
    ref = _reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_ring_flash_gradients_match_full_attention():
    mask = _octo_mask_f()
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("seq",))
    q, k, v = _qkv_f(1)

    def loss_ref(q, k, v):
        return jnp.mean(jnp.square(_reference(q, k, v, mask)))

    def loss_ring(q, k, v):
        return jnp.mean(jnp.square(
            ring_attention(q, k, v, mask, mesh, impl="flash",
                           interpret=True).astype(jnp.float32)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1])
def test_ring_flash_random_blocky_masks_property(seed):
    """Blocky-mask property sweep on the flash inner path, incl. dead rows
    and whole dead (device, step) tiles that exercise the skip tables."""
    rng = np.random.default_rng(seed)
    ring = int(rng.choice([2, 4]))
    mask = np.zeros((SF, SF), dtype=bool)
    edges = np.sort(rng.choice(np.arange(32, SF - 32), size=5,
                               replace=False))
    blocks = np.split(np.arange(SF), edges)
    for bi, rows in enumerate(blocks):
        for bj, cols in enumerate(blocks):
            if bj <= bi and rng.random() < 0.7:
                mask[np.ix_(rows, cols)] = True
    dead = rng.choice(SF, size=4, replace=False)
    mask[dead] = False

    mesh = Mesh(np.asarray(jax.devices()[:ring]), ("seq",))
    q, k, v = _qkv_f(seed + 20)
    out = np.asarray(ring_attention(q, k, v, mask, mesh, impl="flash",
                                    interpret=True))
    ref = np.asarray(_reference(q, k, v, mask))
    live = mask.any(axis=1)
    np.testing.assert_array_equal(out[:, ~live], 0.0)
    np.testing.assert_allclose(out[:, live], ref[:, live],
                               rtol=2e-5, atol=2e-5)


def test_ring_flash_rejects_unaligned_shards():
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("seq",))
    q, k, v = _qkv(0)  # S=64 -> shard 32: not tile-aligned
    with pytest.raises(ValueError, match="divisible"):
        ring_attention(q, k, v, np.ones((S, S), dtype=bool), mesh,
                       impl="flash")


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_ring_random_blocky_masks_property(seed):
    """Property sweep: random block-structured masks (incl. occasional dead
    rows) on random ring sizes must match the dead-row-aware reference."""
    rng = np.random.default_rng(seed)
    ring = int(rng.choice([2, 4, 8]))
    # random block-causal-ish structure
    mask = np.zeros((S, S), dtype=bool)
    edges = np.sort(rng.choice(np.arange(4, S - 4), size=3, replace=False))
    blocks = np.split(np.arange(S), edges)
    for bi, rows in enumerate(blocks):
        for bj, cols in enumerate(blocks):
            if bj <= bi and rng.random() < 0.8:
                mask[np.ix_(rows, cols)] = True
    dead = rng.choice(S, size=2, replace=False)
    mask[dead] = False

    mesh = Mesh(np.asarray(jax.devices()[:ring]), ("seq",))
    q, k, v = _qkv(seed + 10)
    out = np.asarray(ring_attention(q, k, v, mask, mesh))
    ref = np.asarray(_reference(q, k, v, mask))
    live = mask.any(axis=1)
    np.testing.assert_array_equal(out[:, ~live], 0.0)
    np.testing.assert_allclose(out[:, live], ref[:, live],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("impl", ["xla", "flash"])
def test_ring_composes_with_data_parallel(impl):
    """CP x DP: a ('data', 'seq') mesh runs an independent sequence ring
    inside each data slice; results must equal full attention."""
    if impl == "flash":
        s, mesh_shape = SF, (2, 2)
    else:
        s, mesh_shape = S, (2, 4)
    n = mesh_shape[0] * mesh_shape[1]
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(mesh_shape),
                ("data", "seq"))
    mask = np.tril(np.ones((s, s), dtype=bool))
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q, k, v = (jax.random.normal(kk, (4, s, H, D)) for kk in ks)
    out = ring_attention(q, k, v, mask, mesh, impl=impl,
                         interpret=(impl == "flash"), batch_axis="data")
    ref = _reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_cp_dp_gradients():
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "seq"))
    mask = _masks()["octo_block_causal"]
    q, k, v = (jax.random.normal(kk, (4, S, H, D))
               for kk in jax.random.split(jax.random.PRNGKey(6), 3))

    def loss_ring(q, k, v):
        return jnp.mean(jnp.square(ring_attention(
            q, k, v, mask, mesh, batch_axis="data").astype(jnp.float32)))

    def loss_ref(q, k, v):
        return jnp.mean(jnp.square(_reference(q, k, v, mask)))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=1e-6)
