"""REAL multi-process (multi-controller) data parallelism.

The rest of the suite exercises sharding on a single-process 8-virtual-
device mesh; this test runs TWO separate processes coordinated by
``jax.distributed.initialize`` (parallel/distributed.py's mechanism on
real pods), each contributing 4 CPU devices and its own PROCESS-LOCAL
shard of the global batch via ``jax.make_array_from_process_local_data``
— the actual multi-host training pattern, including the cross-process
gradient all-reduce.  Both workers must report the same loss/grad-norm,
and they must match the single-process computation of the identical
global batch (run here on the conftest's 8-device backend).
"""

import os
import socket
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# golden/fidelity/parallel suite: nightly lane (VERDICT r4 item 7)
pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    import jax
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, %(root)r)
    from tests.test_multihost import build_problem

    stack, params, x_global = build_problem()
    assert jax.process_count() == 2 and jax.device_count() == 8
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)  # same value on every process
    local = x_global[pid * 4:(pid + 1) * 4]
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), np.asarray(local), x_global.shape)

    def loss_fn(p, x):
        out = stack.apply({"params": p}, x)
        return jnp.mean(jnp.square(out))

    @jax.jit
    def step(p, x):
        loss, grads = jax.value_and_grad(loss_fn)(p, x)
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                             for g in jax.tree.leaves(grads)))
        return loss, gnorm

    loss, gnorm = step(params, x)
    print("RESULT", pid,
          repr(float(loss.addressable_data(0))),
          repr(float(gnorm.addressable_data(0))), flush=True)
""")


def build_problem():
    """Deterministic tiny stack + params + global batch, identical in
    every process (no RNG state dependence beyond the fixed key)."""
    from multi_modal_transformers_tokenmerge_tpu.core.config import (
        AttentionConfig, TransformerConfig)
    from multi_modal_transformers_tokenmerge_tpu.modules.attention import (
        TransformerStack)

    cfg = TransformerConfig(
        num_blocks=2,
        attention=AttentionConfig(num_heads=2, qkv_features=16,
                                  dropout_rate=0.0),
        mlp_dim=32, dropout_rate=0.0)
    stack = TransformerStack(cfg)
    x_global = (np.arange(8 * 6 * 16, dtype=np.float32)
                .reshape(8, 6, 16) % 7) / 7.0
    params = stack.init(jax.random.PRNGKey(0),
                        jnp.asarray(x_global))["params"]
    return stack, params, x_global


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_matches_single_process(tmp_path):
    if os.environ.get("TPU_LANE") == "1":
        pytest.skip("multi-process CPU test; lane runs the TPU backend")
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER % {"root": ROOT})
    port = _free_port()
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_ENABLE_COMPILATION_CACHE="false")
    env.pop("PALLAS_AXON_POOL_IPS", None)

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=280)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, loss, gnorm = line.split()
                results[int(pid)] = (float(loss), float(gnorm))
    assert set(results) == {0, 1}, results
    # both controllers computed the same replicated loss/grad-norm
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)

    # single-process reference on the conftest backend: same batch, no mesh
    stack, params, x_global = build_problem()
    out = stack.apply({"params": params}, jnp.asarray(x_global))
    loss_ref = float(jnp.mean(jnp.square(out)))
    grads = jax.grad(lambda p: jnp.mean(jnp.square(
        stack.apply({"params": p}, jnp.asarray(x_global)))))(params)
    gnorm_ref = float(jnp.sqrt(sum(jnp.sum(jnp.square(g))
                                   for g in jax.tree.leaves(grads))))
    np.testing.assert_allclose(results[0], (loss_ref, gnorm_ref),
                               rtol=2e-5)


DATA_WORKER = textwrap.dedent("""
    import sys
    pid, port, rec_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    import jax
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, %(root)r)
    from multi_modal_transformers_tokenmerge_tpu.utils.recordio import (
        RecordReader)

    # per-process DISJOINT shard of the same dataset — the multi-host
    # input-pipeline contract (shard_id=jax.process_index())
    reader = RecordReader(rec_path, batch_size=4, shuffle_seed=7,
                          shard_id=pid, num_shards=2, backend="numpy")
    batch = next(reader)
    local = np.asarray(batch["x"], np.float32)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (8, local.shape[1]))
    w = jnp.asarray(np.linspace(-1.0, 1.0, local.shape[1]), jnp.float32)
    loss = jax.jit(lambda x, w: jnp.mean(jnp.square(x @ w)))(x, w)
    print("DATA_RESULT", pid, repr(float(loss.addressable_data(0))),
          flush=True)
""")


def test_two_process_sharded_reader_feeds_global_batch(tmp_path):
    """Full multi-host input pipeline: each process reads its DISJOINT
    RecordReader shard (shard_id=process_index) and contributes it as the
    process-local piece of one global batch; the jitted global loss must
    equal the single-process value over the union of both shards."""
    from multi_modal_transformers_tokenmerge_tpu.utils.recordio import (
        RecordReader, write_records)

    if os.environ.get("TPU_LANE") == "1":
        pytest.skip("multi-process CPU test; lane runs the TPU backend")

    rng = np.random.default_rng(3)
    rec = tmp_path / "data.rec"
    write_records(str(rec), ({"x": rng.normal(size=(24,))
                              .astype(np.float32)} for _ in range(32)))

    worker = tmp_path / "data_worker.py"
    worker.write_text(DATA_WORKER % {"root": ROOT})
    port = _free_port()
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_ENABLE_COMPILATION_CACHE="false")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(port), str(rec)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in range(2)]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=280)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        for line in out.splitlines():
            if line.startswith("DATA_RESULT"):
                _, pid, loss = line.split()
                results[int(pid)] = float(loss)
    assert set(results) == {0, 1}, results
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)

    # single-process reference: the same two shards' first batches
    rows = []
    for pid in range(2):
        r = RecordReader(str(rec), batch_size=4, shuffle_seed=7,
                         shard_id=pid, num_shards=2, backend="numpy")
        rows.append(np.asarray(next(r)["x"], np.float32))
    x = np.concatenate(rows)
    w = np.linspace(-1.0, 1.0, x.shape[1]).astype(np.float32)
    loss_ref = float(np.mean((x @ w) ** 2))
    np.testing.assert_allclose(results[0], loss_ref, rtol=2e-5)


CKPT_WORKER = textwrap.dedent("""
    import sys
    pid, port, ckdir, phase = (int(sys.argv[1]), sys.argv[2], sys.argv[3],
                               sys.argv[4])
    import jax
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, %(root)r)
    from multi_modal_transformers_tokenmerge_tpu.train.checkpoint import (
        CheckpointManager)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    local = (np.arange(4 * 16, dtype=np.float32).reshape(4, 16)
             + 1000 * pid)
    mgr = CheckpointManager(ckdir, max_to_keep=2)
    if phase == "save":
        arr = jax.make_array_from_process_local_data(sh, local, (8, 16))
        scalar = jax.device_put(jnp.float32(3.5), repl)
        mgr.save(7, {"w": arr, "step_v": scalar})
        mgr.wait()
        print("CKPT_SAVED", pid, flush=True)
    else:
        tgt = {"w": jax.ShapeDtypeStruct((8, 16), np.float32, sharding=sh),
               "step_v": jax.ShapeDtypeStruct((), np.float32,
                                              sharding=repl)}
        restored = mgr.restore(7, abstract_state=tgt)
        # every process must get back exactly ITS shard rows
        got = np.concatenate([
            np.asarray(restored["w"].addressable_data(d))
            for d in range(jax.local_device_count())])
        assert np.array_equal(got, local), (got[:, 0], local[:, 0])
        print("CKPT_RESTORED", pid,
              repr(float(restored["step_v"].addressable_data(0))),
              flush=True)
""")


def _run_two(script_path, args, env):
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(script_path), str(pid), str(port), *args],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=280)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        outs.append(out)
    return "\n".join(outs)


def test_two_process_sharded_checkpoint_roundtrip(tmp_path):
    """Multi-controller orbax: two coordinated processes save one SHARDED
    train state (each owning half the rows), a fresh two-process session
    restores it into the same sharding, and every process must receive
    exactly its own shard back plus the replicated scalar."""
    if os.environ.get("TPU_LANE") == "1":
        pytest.skip("multi-process CPU test; lane runs the TPU backend")
    worker = tmp_path / "ckpt_worker.py"
    worker.write_text(CKPT_WORKER % {"root": ROOT})
    ckdir = tmp_path / "ck"
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_ENABLE_COMPILATION_CACHE="false")
    env.pop("PALLAS_AXON_POOL_IPS", None)

    out_save = _run_two(worker, [str(ckdir), "save"], env)
    assert out_save.count("CKPT_SAVED") == 2, out_save
    out_restore = _run_two(worker, [str(ckdir), "restore"], env)
    assert out_restore.count("CKPT_RESTORED") == 2, out_restore
    assert out_restore.count("3.5") == 2, out_restore


TRAIN_WORKER = textwrap.dedent("""
    import sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    import jax
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, %(root)r)
    import optax
    from tests.test_multihost import build_octo_problem
    from multi_modal_transformers_tokenmerge_tpu.parallel.mesh import (
        batch_sharding, make_mesh, param_shardings)
    from multi_modal_transformers_tokenmerge_tpu.train.state import (
        create_train_state)
    from multi_modal_transformers_tokenmerge_tpu.train.steps import (
        make_train_step)

    model, variables, rngs, text, images, actions = build_octo_problem()
    mesh = make_mesh(data=8, model=1, devices=jax.devices())
    state = create_train_state(model, variables, optax.adamw(1e-3),
                               rngs=rngs)
    shardings = param_shardings(state.params, mesh, model_parallel=False,
                                fsdp=False)
    state = state.replace(
        params=jax.tree.map(jax.device_put, state.params, shardings),
        opt_state=jax.device_put(
            state.opt_state, NamedSharding(mesh, P())))
    bs = batch_sharding(mesh)
    lo, hi = pid * 4, (pid + 1) * 4  # process-LOCAL half of the batch
    put = lambda a: jax.make_array_from_process_local_data(
        bs, np.asarray(a[lo:hi]), a.shape)
    step = make_train_step("continuous")
    state, loss = step(state, put(text), put(images), put(actions))
    pnorm = jnp.sqrt(sum(jnp.sum(jnp.square(p.astype(jnp.float32)))
                         for p in jax.tree.leaves(state.params)))
    print("TRAIN_RESULT", pid, repr(float(loss.addressable_data(0))),
          repr(float(jax.device_get(pnorm))), flush=True)
""")


def build_octo_problem():
    """Tiny full-Octo continuous-head training problem, deterministic and
    identical in every process."""
    from multi_modal_transformers_tokenmerge_tpu.core.config import (
        AttentionConfig, ContinuousHeadConfig, HeadsConfig,
        ImageTokenizerConfig, OctoConfig, ResNetEmbedderConfig,
        TextEncoderConfig, TransformerConfig)
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo

    cfg = OctoConfig(
        input_sequence="[TaskDescriptionPrefix{4}] [Image{4};Readout{2}]",
        token_embedding_dim=32,
        num_observation_blocks=1,
        tokens_per_readout=2,
        text=TextEncoderConfig(kind="embed", vocab_size=64, max_length=4,
                               embedding_dim=32),
        images=ImageTokenizerConfig(
            image_size=(64, 64, 3), patch_size=32, position_interval=16,
            embedding_dim=32,
            resnet=ResNetEmbedderConfig(
                num_blocks=1, features=8, input_kernel=(8, 8),
                input_stride=(4, 4), group_norm_groups=4,
                output_features=32)),
        transformer=TransformerConfig(
            num_blocks=2,
            attention=AttentionConfig(num_heads=2, qkv_features=32),
            mlp_dim=64),
        heads=HeadsConfig(continuous=ContinuousHeadConfig(
            max_action=1.0, action_space_dim=4)),
    )
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = np.ones((8, 4), dtype=np.int32)
    images = ((np.arange(8 * 64 * 64 * 3, dtype=np.float32)
               .reshape(8, 64, 64, 3) % 255))
    actions = np.tile(np.linspace(-0.5, 0.5, 4, dtype=np.float32), (8, 1))
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        jnp.asarray(text), jnp.asarray(images))
    rngs = {"dropout": keys[2], "patch_encoding": keys[1]}
    return model, variables, rngs, text, images, actions


def test_two_process_octo_train_step_matches_single_process(tmp_path):
    """Capstone multi-host check: one donated jitted Octo train step
    (continuous head) over a REAL two-process mesh, each process feeding
    its local half of the batch.  Loss and the updated-parameter global
    norm must match the identical step on the single-process 8-device
    backend."""
    import optax

    from multi_modal_transformers_tokenmerge_tpu.train.state import (
        create_train_state)
    from multi_modal_transformers_tokenmerge_tpu.train.steps import (
        make_train_step)

    if os.environ.get("TPU_LANE") == "1":
        pytest.skip("multi-process CPU test; lane runs the TPU backend")
    worker = tmp_path / "train_worker.py"
    worker.write_text(TRAIN_WORKER % {"root": ROOT})
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_ENABLE_COMPILATION_CACHE="false")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = _run_two(worker, [], env)

    results = {}
    for line in out.splitlines():
        if line.startswith("TRAIN_RESULT"):
            _, pid, loss, pnorm = line.split()
            results[int(pid)] = (float(loss), float(pnorm))
    assert set(results) == {0, 1}, out
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)

    # single-process reference (conftest 8-device backend, unsharded)
    model, variables, rngs, text, images, actions = build_octo_problem()
    state = create_train_state(model, variables, optax.adamw(1e-3),
                               rngs=rngs)
    step = make_train_step("continuous")
    state, loss = step(state, jnp.asarray(text), jnp.asarray(images),
                       jnp.asarray(actions))
    pnorm = float(jnp.sqrt(sum(
        jnp.sum(jnp.square(p.astype(jnp.float32)))
        for p in jax.tree.leaves(state.params))))
    np.testing.assert_allclose(results[0], (float(loss), pnorm),
                               rtol=2e-5)
