"""Multi-device tests on the 8-device virtual CPU mesh: data-parallel
training, tensor-parallel parameter sharding, and DP/TP equivalence with the
single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
from multi_modal_transformers_tokenmerge_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
)
from multi_modal_transformers_tokenmerge_tpu.train.state import (
    create_train_state,
)
from multi_modal_transformers_tokenmerge_tpu.train.steps import make_train_step

from micro_configs import octo_micro


pytestmark = pytest.mark.slow

def _setup(batch, tx=None):
    cfg = octo_micro()
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((batch, 4), dtype=jnp.int32)
    images = jax.random.uniform(keys[0], (batch, 64, 64, 3)) * 255
    actions = jnp.full((batch, 4), 0.3)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        text, images)
    # SGD: updates are linear in gradients, so cross-device reassociation
    # noise stays small (adamw step-1 updates are ~sign(g)*lr — unstable to
    # compare across shardings).
    state = create_train_state(
        model, variables, tx if tx is not None else optax.sgd(1e-2),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})
    return model, state, text, images, actions


def test_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)  # 6 != 8


def test_data_parallel_step_matches_single_device():
    """DP over 8 devices must produce the same loss/params as 1 device."""
    model, state, text, images, actions = _setup(batch=8)
    step = make_train_step("continuous")

    # single-device result
    s1, loss1 = step(state, text, images, actions)

    # data-parallel result
    model2, state2, *_ = _setup(batch=8)
    mesh = make_mesh(data=8, model=1)
    bs = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    state2 = jax.device_put(state2, rep)
    sharded = [jax.device_put(x, bs) for x in (text, images, actions)]
    s2, loss2 = step(state2, *sharded)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    p1 = jax.tree.leaves(s1.params)
    p2 = jax.tree.leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_tensor_parallel_forward_matches_replicated():
    """TP-sharded params give the same predictions as replicated params."""
    model, state, text, images, actions = _setup(batch=4)

    out_ref = model.apply({"params": state.params}, text, images,
                          method="predict_continuous_action")

    mesh = make_mesh(data=4, model=2)
    shardings = param_shardings(state.params, mesh, model_parallel=True)
    # the scanned encoder-block attention kernels must be head-sharded
    blk = shardings["transformer"]["blocks"]["attention"]
    assert blk["query"]["kernel"].spec == P(None, None, "model", None)
    assert blk["out"]["kernel"].spec == P(None, "model", None, None)
    mlp = shardings["transformer"]["blocks"]["mlp"]
    assert mlp["dense_in"]["kernel"].spec == P(None, None, "model")
    assert mlp["dense_out"]["kernel"].spec == P(None, "model", None)

    params_tp = jax.tree.map(jax.device_put, state.params, shardings)
    bs = batch_sharding(mesh)
    out_tp = model.apply({"params": params_tp},
                         jax.device_put(text, bs),
                         jax.device_put(images, bs),
                         method="predict_continuous_action")
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_tp),
                               rtol=2e-5, atol=1e-6)


def test_fsdp_param_sharding_applies():
    model, state, *_ = _setup(batch=4)
    mesh = make_mesh(data=8, model=1)
    shardings = param_shardings(state.params, mesh, model_parallel=False,
                                fsdp=True, fsdp_min_size=2 ** 10)
    specs = [s.spec for s in jax.tree.leaves(
        shardings, is_leaf=lambda x: isinstance(x, NamedSharding))]
    assert any(any(a == "data" for a in spec) for spec in specs), (
        "fsdp sharded nothing")


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_mesh_data_parallel_serving_matches_single_device():
    """PolicyEngine(mesh=...): replicated params + batch sharded over the
    data axis must produce identical actions to single-device serving,
    through both the jit path and the AOT-compiled path."""
    from multi_modal_transformers_tokenmerge_tpu.serve.policy import (
        PolicyEngine)

    model, state, text, images, _ = _setup(batch=8)
    variables = {"params": state.params}

    single = PolicyEngine(model, variables, head="continuous", batch_size=8)
    a_single = single(images, text_tokens=text)

    mesh = make_mesh(data=8, model=1)
    sharded = PolicyEngine(model, variables, head="continuous",
                           batch_size=8, mesh=mesh)
    a_mesh = sharded(images, text_tokens=text)
    assert (sharded._place(images).sharding.spec
            == P("data"))
    np.testing.assert_allclose(np.asarray(a_mesh), np.asarray(a_single),
                               rtol=1e-5, atol=1e-5)

    # AOT path with sharded avals + cached instruction
    sharded.compile((4,), (64, 64, 3))
    a_aot = sharded(images, text_tokens=text)
    np.testing.assert_allclose(np.asarray(a_aot), np.asarray(a_single),
                               rtol=1e-5, atol=1e-5)
    sharded.set_instruction(text)
    a_cached = sharded(images)
    np.testing.assert_allclose(np.asarray(a_cached), np.asarray(a_single),
                               rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="not divisible"):
        PolicyEngine(model, variables, head="continuous", batch_size=3,
                     mesh=mesh)
