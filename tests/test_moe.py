"""Mixture-of-experts MLP block + expert parallelism.

No reference counterpart (the reference has no MoE and no parallelism —
SURVEY.md §2 rows 23-24); correctness is established against a plain
python per-expert routing loop, and EP against the unsharded module on
the 8 virtual devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multi_modal_transformers_tokenmerge_tpu.core.config import (
    AttentionConfig, MoEConfig, TransformerConfig)
from multi_modal_transformers_tokenmerge_tpu.modules.attention import (
    TransformerStack)
from multi_modal_transformers_tokenmerge_tpu.modules.moe import (
    MoEMLPBlock, moe_aux_loss, moe_capacity)
from multi_modal_transformers_tokenmerge_tpu.parallel.mesh import (
    make_mesh, param_shardings, shard_params)


def _make(cfg, b=2, s=12, d=8, mlp_dim=16, seed=0):
    m = MoEMLPBlock(cfg, mlp_dim=mlp_dim, out_dim=d)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, s, d))
    variables = m.init(jax.random.PRNGKey(seed), x)
    return m, variables, x


def _reference_loop(variables, x, cfg, mlp_dim):
    """Slot-major capacity routing as an explicit python loop."""
    p = variables["params"]
    b, s, d = x.shape
    e, k = cfg.num_experts, cfg.top_k
    cap = moe_capacity(cfg, s)
    logits = np.asarray(x, np.float32) @ np.asarray(p["router"]["kernel"],
                                                    np.float32)
    z = logits - logits.max(-1, keepdims=True)
    probs = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
    order = np.argsort(-probs, axis=-1, kind="stable")[..., :k]
    gate = np.take_along_axis(probs, order, axis=-1)
    if k > 1:
        gate = gate / gate.sum(-1, keepdims=True)

    y = np.zeros((b, s, d), np.float32)
    wi, bi = np.asarray(p["expert_wi"], np.float32), np.asarray(p["expert_bi"], np.float32)
    wo, bo = np.asarray(p["expert_wo"], np.float32), np.asarray(p["expert_bo"], np.float32)
    for bb in range(b):
        counts = np.zeros(e, np.int64)
        for slot_j in range(k):          # slot-major: all 1st choices first
            for ss in range(s):
                ee = int(order[bb, ss, slot_j])
                if counts[ee] < cap:
                    h = np.maximum(x[bb, ss].astype(np.float32) @ wi[ee]
                                   + bi[ee], 0.0)
                    y[bb, ss] += gate[bb, ss, slot_j] * (h @ wo[ee] + bo[ee])
                counts[ee] += 1
    return y


@pytest.mark.parametrize("top_k,cf", [(1, 2.0), (2, 1.0), (1, 0.4)])
def test_moe_matches_expert_loop(top_k, cf):
    cfg = MoEConfig(num_experts=4, top_k=top_k, capacity_factor=cf)
    m, variables, x = _make(cfg)
    y, aux = m.apply(variables, x)
    want = _reference_loop(variables, x, cfg, 16)
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-5, atol=2e-5)
    assert np.isfinite(float(aux))


def test_moe_overflow_contributes_zero():
    """With capacity 1 and all tokens routed to one expert, only the
    first token gets a non-zero MoE output."""
    cfg = MoEConfig(num_experts=2, top_k=1, capacity_factor=1e-9)
    m, variables, x = _make(cfg, b=1, s=6)
    # rig the router so expert 0 always wins by a wide margin
    router = np.zeros_like(np.asarray(variables["params"]["router"]["kernel"]))
    router[:, 0] = 10.0
    variables = jax.tree.map(lambda v: v, variables)
    variables = {"params": {**variables["params"],
                            "router": {"kernel": jnp.asarray(router)}}}
    assert moe_capacity(cfg, 6) == 1
    y, _ = m.apply(variables, x)
    y = np.asarray(y)
    want = _reference_loop(variables, x, cfg, 16)
    np.testing.assert_allclose(y, want, rtol=2e-5, atol=2e-5)
    # capacity 1 per expert, 2 experts: at most 2 tokens produce output,
    # the rest overflow and contribute exactly zero
    nonzero_tokens = (np.abs(y[0]).max(axis=-1) > 0).sum()
    assert 1 <= nonzero_tokens <= 2
    assert (np.abs(y[0]).max(axis=-1) == 0).sum() >= 4


def test_moe_aux_uniform_router_is_one():
    """Zero router kernel -> uniform probs; top-1 ties all resolve to
    expert 0, but frac*prob summed with uniform probs gives exactly 1.0
    only when assignments are uniform — so instead check the analytic
    value: aux = E * sum_e frac_e * (1/E) = sum_e frac_e = 1."""
    cfg = MoEConfig(num_experts=4, top_k=1, capacity_factor=2.0)
    m, variables, x = _make(cfg)
    variables = {"params": {
        **variables["params"],
        "router": {"kernel": jnp.zeros_like(
            variables["params"]["router"]["kernel"])}}}
    _, aux = m.apply(variables, x)
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)


def test_moe_gradients_flow_to_all_param_kinds():
    cfg = MoEConfig(num_experts=4, top_k=2, capacity_factor=2.0)
    m, variables, x = _make(cfg)

    def loss(params):
        y, aux = m.apply({"params": params}, x)
        return jnp.sum(y ** 2) + 0.01 * aux

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        name = jax.tree_util.keystr(path)
        assert np.all(np.isfinite(np.asarray(g))), name
        assert np.abs(np.asarray(g)).max() > 0, f"dead gradient at {name}"


def test_moe_ep_sharded_parity():
    """Experts sharded over model=4, batch over data=2: same outputs and
    gradients as the unsharded module."""
    cfg = MoEConfig(num_experts=4, top_k=2, capacity_factor=1.5)
    m, variables, x = _make(cfg, b=4, s=16, d=8)
    mesh = make_mesh(data=2, model=4)
    specs = param_shardings(variables["params"], mesh)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    moe_specs = {jax.tree_util.keystr(p, simple=True, separator="/"):
                 s.spec for p, s in flat}
    assert moe_specs["expert_wi"][0] == "model"
    assert moe_specs["expert_wo"][0] == "model"
    assert moe_specs["expert_bi"][0] == "model"
    assert moe_specs["expert_bo"][0] == "model"
    assert all(s is None for s in moe_specs["router/kernel"])

    def loss(params, x):
        y, aux = m.apply({"params": params}, x)
        return jnp.sum(y ** 2) + 0.01 * aux

    ref_l, ref_g = jax.value_and_grad(loss)(variables["params"], x)

    sharded_params = shard_params(variables["params"], mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    got_l, got_g = jax.jit(jax.value_and_grad(loss))(sharded_params, xs)
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), got_g, ref_g)


def test_transformer_stack_moe_sows_weighted_aux():
    """The stack sows the aux loss PRE-WEIGHTED by cfg.moe.aux_loss_weight
    (ready-to-add objective term), so doubling the weight doubles the sow."""
    def sown(weight):
        cfg = TransformerConfig(
            num_blocks=2,
            attention=AttentionConfig(num_heads=2, qkv_features=8,
                                      dropout_rate=0.0),
            mlp_dim=16, dropout_rate=0.0, mlp_type="moe",
            moe=MoEConfig(num_experts=2, top_k=1, capacity_factor=2.0,
                          aux_loss_weight=weight))
        stack = TransformerStack(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 8))
        variables = stack.init(jax.random.PRNGKey(0), x)
        y, mutated = stack.apply(variables, x, mutable=["losses"])
        assert y.shape == x.shape
        return float(moe_aux_loss(mutated))

    a = sown(0.01)
    assert a > 0
    np.testing.assert_allclose(sown(0.02), 2 * a, rtol=1e-6)
    # dense path sows nothing and the helper returns 0
    dense_cfg = TransformerConfig(
        num_blocks=2, attention=AttentionConfig(num_heads=2, qkv_features=8,
                                                dropout_rate=0.0),
        mlp_dim=16, dropout_rate=0.0)
    dense = TransformerStack(dense_cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 8))
    dvars = dense.init(jax.random.PRNGKey(0), x)
    _, dmut = dense.apply(dvars, x, mutable=["losses"])
    assert float(moe_aux_loss(dmut)) == 0.0


def test_train_step_trains_moe_router():
    """make_train_step surfaces the sown MoE aux loss: the router weight
    gets a nonzero gradient through the STANDARD train path (a silent
    mutable-collection drop would leave it exactly zero and untrained)."""
    import optax

    from micro_configs import octo_micro
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
    from multi_modal_transformers_tokenmerge_tpu.train.state import (
        create_train_state)
    from multi_modal_transformers_tokenmerge_tpu.train.steps import (
        make_train_step)

    base = octo_micro()
    cfg = base.replace(transformer=base.transformer.replace(
        mlp_type="moe",
        moe=MoEConfig(num_experts=2, top_k=1, capacity_factor=2.0,
                      aux_loss_weight=0.1)))
    model = Octo(cfg)
    b = 4
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((b, 4), jnp.int32)
    images = jax.random.uniform(keys[0], (b, 64, 64, 3)) * 255
    actions = jnp.full((b, 4), 0.3)
    variables = model.init(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images)
    state = create_train_state(
        model, variables, optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})
    step = make_train_step("continuous", donate=False)
    _, loss = step(state, text, images, actions)
    assert np.isfinite(float(loss))

    # the step's objective must equal mean(head loss) + sown weighted aux —
    # if the mutable=['losses'] plumbing regresses, flax silently drops the
    # sow and the step loss collapses to the head loss alone
    rngs = {name: jax.random.fold_in(key, state.step)
            for name, key in state.rngs.items()}
    head_loss, mut = model.apply(
        {"params": state.params}, text, images, actions, rngs=rngs,
        method="compute_l2_loss", mutable=["losses"])
    aux = float(moe_aux_loss(mut))
    assert aux > 0
    np.testing.assert_allclose(float(loss),
                               float(jnp.mean(head_loss)) + aux, rtol=1e-5)
