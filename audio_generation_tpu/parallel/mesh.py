"""Device mesh construction and sharding rules.

The reference is single-process single-GPU (SURVEY.md §2.9: no
torch.distributed anywhere); its only batch-scaling mechanism is gradient
accumulation. The TPU-native scaling story replaces that with SPMD over a
`jax.sharding.Mesh`:

  * `data` axis — batch-sharded data parallelism (the workload's primary
    axis; XLA inserts the gradient all-reduce over ICI);
  * `model` axis — optional tensor parallelism: conv channels and codebooks
    are sharded over `model` via parameter PartitionSpec rules below.

Grad accumulation remains available inside the jitted step (a lax.scan), and
composes with the mesh: global batch = accum x data_axis x per-device batch.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None, axes: Sequence[str] = ("data",)) -> Mesh:
    """Build a mesh over (a prefix of) the visible devices. Default: 1-D
    data-parallel over all of them."""
    devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    assert n <= len(devices), f"mesh shape {shape} needs {n} devices, have {len(devices)}"
    dev_array = mesh_utils.create_device_mesh(tuple(shape), devices=devices[:n])
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard a batch array's leading (or given) axis over 'data'."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def _param_spec(path: str, value, mesh: Mesh) -> P:
    """Tensor-parallel sharding rule for a parameter.

    Conv kernels are (K, Cin, Cout): shard Cout over 'model' when divisible;
    codebooks (nq, S, D): shard the codebook entries S over 'model' (the RVQ
    distance matmul then runs as a sharded matmul with an argmin psum-style
    combine inserted by XLA). Biases/scales stay replicated.
    """
    if "model" not in mesh.axis_names:
        return P()
    msize = mesh.shape["model"]
    shape = value.shape
    if value.ndim == 3 and shape[-1] % msize == 0 and shape[-1] >= 2 * msize:
        return P(None, None, "model")
    if value.ndim == 2 and shape[-1] % msize == 0 and shape[-1] >= 2 * msize:
        return P(None, "model")
    return P()


def shard_params(params, mesh: Mesh):
    """Apply tensor-parallel NamedShardings to a parameter pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def place(path, value):
        spec = _param_spec(jax.tree_util.keystr(path), value, mesh)
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_by_shape(tree, mesh: Mesh):
    """Shard every leaf of a pytree by the tensor-parallel shape rules
    (`_param_spec`); leaves that match no rule are replicated. Used for both
    params and optimizer state (optax moments mirror the param shapes, so the
    same rule keeps them co-sharded with their parameters)."""
    def place(path, value):
        if not hasattr(value, "shape"):
            return value
        spec = _param_spec(jax.tree_util.keystr(path), value, mesh)
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)


def shard_codebook(codebook, mesh: Mesh):
    """Shard quantizer state over 'model': codebook ENTRIES (the S axis of
    (nq, S, D) codebooks/ema_means and (nq, S) counts/usage) are distributed
    across the model axis. The RVQ distance computation then runs with each
    shard scoring its own entries; XLA inserts the cross-shard argmin combine.
    Scalars (cutoff) and non-divisible leaves stay replicated."""
    if "model" not in mesh.axis_names:
        return jax.device_put(codebook, NamedSharding(mesh, P()))
    msize = mesh.shape["model"]

    def place(value):
        if not hasattr(value, "shape"):
            return value
        if value.ndim == 3 and value.shape[1] % msize == 0:
            spec = P(None, "model", None)
        elif value.ndim == 2 and value.shape[1] % msize == 0:
            spec = P(None, "model")
        else:
            spec = P()
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, codebook)


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState on the mesh: tensor-parallel params/opt-state (when
    a 'model' axis exists; fully replicated otherwise), entry-sharded
    codebooks, replicated discriminators and counters. Data parallelism comes
    from batch sharding (`batch_sharding`), not from state placement."""
    return state.replace(
        step=replicate(state.step, mesh),
        params=shard_by_shape(state.params, mesh),
        codebook=shard_codebook(state.codebook, mesh),
        opt_state=shard_by_shape(state.opt_state, mesh),
        discriminators=replicate(state.discriminators, mesh),
        rng=replicate(state.rng, mesh),
    )


# --------------------------------------------------------------------------- #
# Per-host input feeding (SURVEY §2.9 "per-host data loading"; VERDICT r3
# task 6). On a multi-host pod every process builds ONLY its own rows of the
# global batch; jax.make_array_from_process_local_data assembles the global
# sharded array from the per-process shards without any cross-host gather of
# raw audio. Single-process training is the pc == 1 special case (slice =
# the whole batch), so the same trainer code path serves both.
# --------------------------------------------------------------------------- #

def host_batch_slice(global_batch: int, process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> tuple[int, int]:
    """(start, rows) of this host's contiguous slice of the global batch
    axis. Requires the global batch to divide evenly across processes (the
    same constraint the mesh 'data' axis already imposes per device)."""
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    if global_batch % pc != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {pc}"
        )
    per = global_batch // pc
    return pi * per, per


def global_batch_from_local(local, mesh: Mesh, spec: P):
    """Assemble the global jax.Array from this process's local rows.

    `local` holds only this host's `host_batch_slice` rows along the batch
    dimension named by `spec`; the result is a global array sharded per
    `spec` whose addressable shards live on this process's devices."""
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local)
    )
