import jax
import jax.numpy as jnp
import numpy as np

from playaid_core_tpu.parallel.mesh import (
    DEFAULT_TP_RULES,
    batch_sharding,
    make_mesh,
    param_shardings,
    param_specs,
    shard_params,
)
from playaid_core_tpu.parallel.staging import BackgroundIterator, device_prefetch


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 CPU devices
    assert mesh.axis_names == ("data", "model")

    mesh2 = make_mesh(model_parallel=2)
    assert mesh2.devices.shape == (4, 2)


def test_batch_sharding_distributes():
    mesh = make_mesh()
    x = jnp.zeros((16, 4))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8


def test_param_specs_rules():
    mesh = make_mesh(model_parallel=2)
    params = {
        "layer_0": {"ffn_in": {"kernel": jnp.zeros((256, 2048)), "bias": jnp.zeros((2048,))}},
        "conv_init": {"kernel": jnp.zeros((7, 7, 3, 64))},
        "classifier": {"kernel": jnp.zeros((256, 63)), "bias": jnp.zeros((63,))},
    }
    specs = param_specs(params, mesh)
    assert specs["layer_0"]["ffn_in"]["kernel"] == jax.sharding.PartitionSpec(None, "model")
    assert specs["conv_init"]["kernel"] == jax.sharding.PartitionSpec()
    # 63 classes don't divide by 2 -> falls back to replicated.
    assert specs["classifier"]["kernel"] == jax.sharding.PartitionSpec()


def test_shard_params_places_on_mesh():
    mesh = make_mesh(model_parallel=2)
    params = {"layer_0": {"ffn_in": {"kernel": jnp.zeros((128, 2048))}}}
    sharded = shard_params(mesh, params)
    k = sharded["layer_0"]["ffn_in"]["kernel"]
    assert len(k.sharding.device_set) == 8


def test_tp_matmul_correctness():
    """A sharded dense matmul under jit produces the same numbers as the
    unsharded computation."""
    mesh = make_mesh(model_parallel=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(64, 256)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(256, 32)).astype(np.float32))

    expected = np.asarray(jnp.maximum(x @ w1, 0) @ w2)

    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    w1s = jax.device_put(w1, NamedSharding(mesh, P(None, "model")))
    w2s = jax.device_put(w2, NamedSharding(mesh, P("model", None)))

    @jax.jit
    def f(x, w1, w2):
        return jnp.maximum(x @ w1, 0) @ w2

    with mesh:
        out = f(xs, w1s, w2s)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4)


def test_device_prefetch_order():
    items = [np.full((2, 2), i) for i in range(5)]
    out = list(device_prefetch(items, size=2))
    assert len(out) == 5
    for i, x in enumerate(out):
        assert float(np.asarray(x)[0, 0]) == i


def test_background_iterator():
    out = list(BackgroundIterator(range(10), maxsize=3))
    assert out == list(range(10))


def test_background_iterator_slow_consumer_terminates():
    """Regression: when the producer finishes while the queue is still
    FULL (fast producer, slow consumer — the trainer-through-tunnel
    shape), the end-of-iteration sentinel must still reach the consumer.
    The old put_nowait dropped it and the consumer deadlocked in get()
    after draining the pending batches."""
    import threading
    import time

    it = BackgroundIterator(range(3), maxsize=2)
    time.sleep(0.5)  # let the producer fill the queue and hit its finally

    out = []

    def consume():
        for x in it:
            out.append(x)
            time.sleep(0.05)  # stay slower than the producer

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=10.0)
    assert not t.is_alive(), "consumer deadlocked waiting for the sentinel"
    assert out == [0, 1, 2]


def test_background_iterator_propagates_errors():
    def gen():
        yield 1
        raise ValueError("boom")

    it = iter(BackgroundIterator(gen()))
    assert next(it) == 1
    try:
        list(it)
        raised = False
    except ValueError:
        raised = True
    assert raised
