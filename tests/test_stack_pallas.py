"""Fused residual-stack Pallas kernel (ops/stack_pallas.py) vs the XLA path.

The kernel must be a pure execution strategy: same math (up to accumulation
order), same param tree, bit-equal codes through the VAE. Runs in interpret
mode on the CPU test mesh (as rvq_pallas does)."""
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from audio_generation_tpu.models.blocks import CausalDecoderBlock, CausalEncoderBlock
from audio_generation_tpu.models.vae import CausalVQAE
from audio_generation_tpu.ops.stack_pallas import (
    fused_residual_stack,
    residual_stack_xla,
)

DILS = (1, 3, 9)


def _mk_blocks(rng, c, k=7, n=3, scale=0.1):
    return tuple(
        (
            jnp.asarray(rng.randn(k, c, c).astype(np.float32) * scale),
            jnp.asarray(rng.randn(c).astype(np.float32) * scale),
            jnp.asarray(rng.randn(1, c, c).astype(np.float32) * scale),
            jnp.asarray(rng.randn(c).astype(np.float32) * scale),
        )
        for _ in range(n)
    )


@pytest.mark.parametrize(
    "fold,c,lf,tile",
    [
        (4, 32, 200, 50),  # flagship 32-ch stage: multi-tile with halo carry
        (4, 32, 513, 128),  # length not divisible by tile (host pad path)
        (2, 64, 64, 64),  # single tile
        (1, 128, 97, 100),  # unfolded (dilated taps), tile clamped to history
    ],
)
def test_stack_parity_f32(fold, c, lf, tile):
    rng = np.random.RandomState(0)
    blocks = _mk_blocks(rng, c)
    x = jnp.asarray(rng.randn(2, lf, fold * c).astype(np.float32))
    ref = residual_stack_xla(x, blocks, fold=fold, dilations=DILS)
    got = fused_residual_stack(x, blocks, fold=fold, dilations=DILS, tile=tile)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 5e-6, rel


def test_stack_parity_bf16():
    rng = np.random.RandomState(1)
    blocks = _mk_blocks(rng, 32)
    x = jnp.asarray(rng.randn(1, 120, 128).astype(np.float32)).astype(jnp.bfloat16)
    ref = residual_stack_xla(x, blocks, fold=4, dilations=DILS).astype(jnp.float32)
    got = fused_residual_stack(x, blocks, fold=4, dilations=DILS, tile=60).astype(
        jnp.float32
    )
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 5e-3, rel


def test_stack_grads_match_xla():
    """The custom VJP must reproduce the XLA path's gradients (it literally
    recomputes through it) for both the input and every weight leaf."""
    rng = np.random.RandomState(2)
    blocks = _mk_blocks(rng, 32)
    x = jnp.asarray(rng.randn(1, 80, 128).astype(np.float32))

    def loss_p(x_, b_):
        return jnp.sum(
            fused_residual_stack(x_, b_, fold=4, dilations=DILS, tile=40) ** 2
        )

    def loss_x(x_, b_):
        return jnp.sum(residual_stack_xla(x_, b_, fold=4, dilations=DILS) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(x, blocks)
    gx = jax.grad(loss_x, argnums=(0, 1))(x, blocks)
    for a, b in zip(jtu.tree_leaves(gp), jtu.tree_leaves(gx)):
        rel = float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-30))
        assert rel < 1e-5, rel


@pytest.mark.parametrize("Block", [CausalEncoderBlock, CausalDecoderBlock])
def test_block_module_parity(Block):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 96, 32).astype(np.float32))
    kw = dict(out_channels=32, stride=2, n_layers=4)
    m0, m1 = Block(**kw), Block(**kw, pallas_stack=True)
    v = m0.init(jax.random.key(0), x)
    assert jtu.tree_all(
        jtu.tree_map(jnp.array_equal, v, m1.init(jax.random.key(0), x))
    ), "pallas_stack changed the param tree"
    y0, y1 = m0.apply(v, x), m1.apply(v, x)
    rel = float(jnp.linalg.norm(y1 - y0) / jnp.linalg.norm(y0))
    assert rel < 5e-6, rel


def test_vae_end_to_end_parity():
    kw = dict(
        n_blocks=2,
        strides=(2, 3),
        first_block_channels=32,
        num_quantizers=2,
        codebook_size=64,
        codebook_dim=64,
        wavelet_decoders=(False, True),
    )
    m0, m1 = CausalVQAE(**kw), CausalVQAE(**kw, use_pallas_stack=True)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 720, 1).astype(np.float32))
    v = m0.init(jax.random.key(0), x)
    # the fused path must actually be in the traced graph
    jaxpr = str(jax.make_jaxpr(lambda v_, x_: m1.apply(v_, x_))(v, x))
    assert jaxpr.count("pallas_call") == 4  # 2 encoder + 2 decoder stacks
    y0, y1 = m0.apply(v, x), m1.apply(v, x)
    rel = float(jnp.linalg.norm(y1[0] - y0[0]) / jnp.linalg.norm(y0[0]))
    assert rel < 2e-5, rel
    _, _, codes0 = m0.apply(v, x, method="encode")
    _, _, codes1 = m1.apply(v, x, method="encode")
    assert jnp.array_equal(codes0, codes1), "indices must be bit-equal"


def test_pick_tile_mosaic_legal():
    """Mosaic rejects a partial time-block that is not a multiple of 8
    sublanes (first real-TPU run: block 1500 of 3000 -> lowering error).
    The auto-picked tile must be 8-aligned whenever it is partial."""
    from audio_generation_tpu.ops.stack_pallas import _pick_tile

    for lf, lanes in [
        (3000, 256),   # the failing flagship decoder stage
        (18000, 128),  # 72 kHz folded stem
        (4800, 512),
        (97, 128),     # single tile (block == array, any size legal)
        (2049, 256),   # no divisor in range -> padded fallback
    ]:
        t = _pick_tile(lf, lanes)
        assert t == lf or t % 8 == 0, (lf, lanes, t)
        assert 0 < t <= lf
        cap = max(256, (4096 * 128) // lanes)
        assert t <= max(cap, lf if lf <= cap else 0)


def test_forward_tile_normalization_parity():
    """An explicit non-8-aligned tile is rounded up inside _forward; the
    result must stay bit-identical to the XLA path (tiling is pure strategy)."""
    rng = np.random.RandomState(7)
    c, fold, lf = 32, 4, 200
    blocks = _mk_blocks(rng, c)
    x = jnp.asarray(rng.randn(2, lf, fold * c).astype(np.float32) * 0.1)
    ref = residual_stack_xla(x, blocks, fold=fold, dilations=DILS)
    got = fused_residual_stack(x, blocks, fold=fold, dilations=DILS, tile=50)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_tpu_compile_smoke():
    """REAL-backend Mosaic compile gate. Interpret-mode parity proved
    insufficient twice in round 4 (9/9 green while the kernel could not
    compile on hardware: first a non-8-aligned tile, then a bf16 arith.cmpf
    from leaky_relu). This test actually lowers + compiles the kernel on the
    session backend when it is a TPU; on the CPU test mesh it skips rather
    than silently re-testing interpret mode."""
    if jax.default_backend() != "tpu":
        pytest.skip("TPU backend not available (CPU test mesh)")
    rng = np.random.RandomState(0)
    c, fold, lf = 32, 4, 3000  # the flagship decoder stage that failed
    blocks = _mk_blocks(rng, c)
    bf = jnp.bfloat16
    blocks_bf = jtu.tree_map(lambda a: a.astype(bf), blocks)
    x = jnp.asarray(rng.randn(2, lf, fold * c).astype(np.float32) * 0.1).astype(bf)
    got = jax.jit(
        lambda x, b: fused_residual_stack(x, b, fold=fold, dilations=DILS)
    )(x, blocks_bf)
    ref = residual_stack_xla(x, blocks_bf, fold=fold, dilations=DILS)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )
