"""Fused Pallas RVQ kernel vs the scan-based quantizer (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_generation_tpu.models.quantizer import ResidualQuantizer
from audio_generation_tpu.ops.rvq_pallas import rvq_encode


@pytest.mark.parametrize("N", [64, 100])  # 100 exercises tile padding
def test_pallas_rvq_matches_scan(rng, N):
    nq, S, D = 4, 32, 16
    q = ResidualQuantizer(
        num_quantizers=nq, dim=D, codebook_sizes=S, quantizer_class="ema", use_som=False
    )
    state = q.init_state(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(1, N, D)).astype(np.float32))

    _, idx_ref, _, _ = q(state, x)
    idx_k, qsum_k = rvq_encode(
        x.reshape(N, D), state.codebooks, tile_n=32, interpret=True
    )

    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_ref)[0])

    # quantized sum matches dequantized indices
    deq = q.dequantize(state, idx_ref)[0]
    np.testing.assert_allclose(np.asarray(qsum_k), np.asarray(deq), rtol=1e-5, atol=1e-6)


def test_pallas_rvq_residual_property(rng):
    """Each additional level strictly reduces reconstruction error."""
    nq, S, D = 8, 64, 16
    q = ResidualQuantizer(
        num_quantizers=nq, dim=D, codebook_sizes=S, quantizer_class="ema", use_som=False
    )
    state = q.init_state(jax.random.key(1))
    x = rng.normal(size=(128, D)).astype(np.float32)
    idx, qsum = rvq_encode(jnp.asarray(x), state.codebooks, tile_n=64, interpret=True)
    assert np.isfinite(np.asarray(qsum)).all()
    err = np.mean((x - np.asarray(qsum)) ** 2)
    # 8 levels should reduce error well below the raw signal power
    assert err < np.mean(x**2)
