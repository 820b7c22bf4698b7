"""Context (sequence) parallelism over the time axis for long-audio encode.

SURVEY.md §5.7 / §2.9: the reference handles long audio architecturally
(fully-convolutional, single device); the TPU-native extension shards the
*time axis* across devices. Because the encoder is strictly causal, each
device only needs a fixed left halo (>= the receptive field) from its left
neighbor — one `ppermute` over the mesh axis — after which every device
encodes its chunk independently (the same overlap-save contract as
streaming.py, distributed).

Shard 0 sees a zero halo, so (exactly like the first streaming chunk) its
first few frames differ from whole-clip processing; every other shard is
bit-exact. Works for arbitrary-length audio whose per-device chunk is a
multiple of the codec stride.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8 promotes shard_map out of experimental (and renames
    # check_rep -> check_vma); support both without deprecation noise
    import inspect

    from jax import shard_map as _shard_map

    _CHECK_KW = (
        "check_vma"
        if "check_vma" in inspect.signature(_shard_map).parameters
        else "check_rep"
    )
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

    _CHECK_KW = "check_rep"


def shard_map(f, mesh, in_specs, out_specs):
    return _shard_map(
        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **{_CHECK_KW: False}
    )


def context_parallel_encode(
    model,
    variables,
    x,
    mesh: Mesh,
    axis_name: str = "time",
    ctx_frames: int = 32,
):
    """Encode (B, L) waveforms with L sharded over `axis_name`.

    Args:
      model: CausalVQAE (input_format-agnostic; raw waveform in, codes out).
      variables: replicated model variables.
      x: (B, L) f32, L divisible by (mesh[axis_name] * stride).
      ctx_frames: left halo in latent frames (>= receptive field / stride).

    Returns indices (B, L // stride, nq), sharded over `axis_name` on axis 1.
    """
    stride = model.scale_factor
    n_shards = mesh.shape[axis_name]
    B, L = x.shape
    assert L % (n_shards * stride) == 0, (
        f"length {L} must be divisible by shards*stride = {n_shards * stride}"
    )
    halo = ctx_frames * stride
    local_len = L // n_shards
    assert halo <= local_len, "halo larger than a local chunk; use fewer shards"

    def local_encode(variables, x_block):
        # x_block: (B, local_len) on this device
        right_edge = x_block[:, -halo:]
        perm = [(i, i + 1) for i in range(n_shards - 1)]
        left_halo = jax.lax.ppermute(right_edge, axis_name, perm)  # zeros on shard 0
        window = jnp.concatenate([left_halo, x_block], axis=1)
        inp = window[:, :, None] if model.input_format == "b l c" else window[:, None, :]
        (z_q, _commit, indices), _ = model.apply(
            variables, inp, method="encode", mutable=["codebook"]
        )
        return indices[:, ctx_frames:, :]  # drop the halo's frames

    spec_x = P(None, axis_name)
    spec_out = P(None, axis_name, None)
    fn = shard_map(
        local_encode,
        mesh=mesh,
        in_specs=(P(), spec_x),
        out_specs=spec_out,
    )
    x = jax.device_put(x, NamedSharding(mesh, spec_x))
    variables = jax.device_put(variables, NamedSharding(mesh, P()))
    return jax.jit(fn)(variables, x)
