"""Multi-chip sharding on the virtual 8-device CPU mesh (SURVEY.md §4/§2.9)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from audio_generation_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_1d():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8}


def test_make_mesh_2d():
    mesh = make_mesh((4, 2), ("data", "model"))
    assert mesh.shape == {"data": 4, "model": 2}


def test_batch_sharded_forward(rng):
    """Data-parallel codec forward over the mesh: jit inserts the collectives."""
    from audio_generation_tpu.models import CausalVQAE

    mesh = make_mesh()
    model = CausalVQAE(
        in_channels=1,
        n_blocks=2,
        n_layers_per_block=2,
        first_block_channels=4,
        num_quantizers=2,
        codebook_size=16,
        codebook_dim=8,
        strides=(2, 3),
        wavelet_decoders=(False, False),
        input_format="n c l",
        use_som=False,
        vq_type="ema",
    )
    x_host = rng.normal(size=(8, 1, 60)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 60)))

    x = jax.device_put(jnp.asarray(x_host), NamedSharding(mesh, P("data", None, None)))
    variables = jax.device_put(variables, NamedSharding(mesh, P()))

    @jax.jit
    def fwd(variables, x):
        (y, commit, idx), _ = model.apply(variables, x, mutable=["codebook"])
        return y, idx

    y, idx = fwd(variables, x)
    assert y.shape == (8, 1, 60)
    # output stays batch-sharded
    assert "data" in str(y.sharding.spec) or y.sharding.is_fully_replicated is False

    # numerics match the unsharded run
    y_ref, idx_ref = jax.jit(fwd)(
        jax.device_put(variables, jax.devices()[0]),
        jax.device_put(jnp.asarray(x_host), jax.devices()[0]),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))


def test_shard_params_tensor_parallel():
    mesh = make_mesh((4, 2), ("data", "model"))
    params = {
        "conv": {"w": jnp.zeros((7, 8, 64)), "b": jnp.zeros((64,))},
        "small": {"w": jnp.zeros((1, 2, 3))},
    }
    sharded = shard_params(params, mesh)
    assert sharded["conv"]["w"].sharding.spec == P(None, None, "model")
    assert sharded["conv"]["b"].sharding.spec == P()
    assert sharded["small"]["w"].sharding.spec == P()


def test_graft_dryrun_multichip():
    """The driver's multi-chip validation path must run end to end."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_context_parallel_encode(rng):
    """Time-axis (sequence) parallel encode: interior shards bit-exact with
    whole-clip processing (shard 0 warms up from a zero halo, like the first
    streaming chunk)."""
    import jax.numpy as jnp

    from audio_generation_tpu.models import CausalVQAE
    from audio_generation_tpu.parallel.context import context_parallel_encode

    model = CausalVQAE(
        in_channels=1,
        n_blocks=2,
        n_layers_per_block=2,
        first_block_channels=4,
        num_quantizers=2,
        codebook_size=16,
        codebook_dim=8,
        strides=(2, 3),  # stride 6
        wavelet_decoders=(False, False),
        input_format="n c l",
        use_som=False,
        vq_type="ema",
    )
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 60)))
    mesh = make_mesh((4,), ("time",))

    frames_per_shard = 50
    L = 4 * frames_per_shard * 6
    x = rng.normal(size=(2, L)).astype(np.float32) * 0.3

    idx_cp = np.asarray(
        context_parallel_encode(model, variables, jnp.asarray(x), mesh, "time", ctx_frames=30)
    )

    (_, _, idx_full), _ = model.apply(
        variables, jnp.asarray(x)[:, None, :], method="encode", mutable=["codebook"]
    )
    idx_full = np.asarray(idx_full)
    assert idx_cp.shape == idx_full.shape
    # all shards except shard 0 are exact
    np.testing.assert_array_equal(idx_cp[:, frames_per_shard:], idx_full[:, frames_per_shard:])
