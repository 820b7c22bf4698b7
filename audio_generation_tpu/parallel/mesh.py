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
