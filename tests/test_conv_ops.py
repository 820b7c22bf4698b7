"""Causal-conv pad law, shape contracts, causality properties, torch parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_generation_tpu.ops import (
    avg_pool1d,
    box_fold,
    causal_conv1d,
    causal_conv1d_out_length,
    causal_conv_transpose1d,
    causal_pad_amounts,
    causal_upsample_conv1d,
    same_conv1d,
    upsample_nearest,
)

import math


def ref_pad_amounts(length, kernel_size, stride, dilation):
    # the reference's formula, verbatim semantics (networks/vae.py:32,39-43)
    pad = dilation * (kernel_size - 1) - stride + 1
    next_length = (length - kernel_size + pad) / stride + 1
    target_length = (math.ceil(next_length) - 1) * stride + kernel_size - pad
    return pad, target_length - length


@pytest.mark.parametrize("length", [480, 481, 7, 100, 65280, 72000])
@pytest.mark.parametrize("kernel,stride,dilation", [
    (7, 1, 1), (3, 1, 1), (1, 1, 1),
    (5, 2, 1), (7, 3, 1), (9, 4, 1), (11, 5, 1),
    (7, 1, 3), (7, 1, 9), (7, 1, 27),
])
def test_pad_law_matches_reference(length, kernel, stride, dilation):
    assert causal_pad_amounts(length, kernel, stride, dilation) == ref_pad_amounts(
        length, kernel, stride, dilation
    )


@pytest.mark.parametrize("length", [480, 481, 100, 72000])
@pytest.mark.parametrize("kernel,stride", [(5, 2), (7, 3), (9, 4), (11, 5)])
def test_out_length_is_ceil(length, kernel, stride):
    assert causal_conv1d_out_length(length, kernel, stride) == -(-length // stride)


def test_conv_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 100, 4)), dtype=jnp.float32)
    w = jnp.asarray(rng.normal(size=(7, 4, 8)), dtype=jnp.float32)
    y = causal_conv1d(x, w, stride=3)
    assert y.shape == (2, 34, 8)
    y = causal_conv1d(x, w, dilation=9)
    assert y.shape == (2, 100, 8)


def test_conv_causality(rng):
    """Output at frame t must not change when future samples change."""
    x1 = rng.normal(size=(1, 96, 3)).astype(np.float32)
    x2 = x1.copy()
    t_in = 48
    x2[:, t_in:, :] = rng.normal(size=(1, 96 - t_in, 3))
    w = jnp.asarray(rng.normal(size=(7, 3, 5)), dtype=jnp.float32)
    for stride, dilation in [(1, 1), (1, 3), (2, 1), (4, 1)]:
        y1 = causal_conv1d(jnp.asarray(x1), w, stride=stride, dilation=dilation)
        y2 = causal_conv1d(jnp.asarray(x2), w, stride=stride, dilation=dilation)
        # frame j of a stride-s causal conv sees inputs <= j*s
        t_out = (t_in - 1) // stride  # last output frame fully in the past
        np.testing.assert_allclose(y1[:, : t_out + 1], y2[:, : t_out + 1], rtol=1e-6)
        assert not np.allclose(y1[:, t_out + 1 :], y2[:, t_out + 1 :])


def test_conv_torch_parity(rng):
    """Golden check against torch.nn.functional.conv1d with the same padding."""
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(2, 50, 3)).astype(np.float32)
    w = rng.normal(size=(7, 3, 5)).astype(np.float32)
    b = rng.normal(size=(5,)).astype(np.float32)
    for stride, dilation in [(1, 1), (2, 1), (1, 3), (3, 1)]:
        pad, extra = causal_pad_amounts(50, 7, stride, dilation)
        xt = torch.from_numpy(x.transpose(0, 2, 1))  # (B, C, L)
        xt = torch.nn.functional.pad(xt, (pad, extra))
        wt = torch.from_numpy(w.transpose(2, 1, 0))  # (Cout, Cin, K)
        yt = torch.nn.functional.conv1d(
            xt, wt, torch.from_numpy(b), stride=stride, dilation=dilation
        )
        y = causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride, dilation=dilation)
        np.testing.assert_allclose(
            np.asarray(y), yt.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5
        )


def test_conv_transpose_shape_and_parity(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(2, 25, 4)).astype(np.float32)
    for k, s in [(7, 1), (9, 4), (11, 5), (7, 3)]:
        w = rng.normal(size=(k, 4, 6)).astype(np.float32) * 0.1
        y = causal_conv_transpose1d(jnp.asarray(x), jnp.asarray(w), stride=s)
        assert y.shape == (2, 25 * s, 6)
        # torch ConvTranspose1d weight layout (Cin, Cout, K); crop right k - s
        xt = torch.from_numpy(x.transpose(0, 2, 1))
        wt = torch.from_numpy(w.transpose(1, 2, 0))  # (Cin, Cout, K)
        yt = torch.nn.functional.conv_transpose1d(xt, wt, stride=s)
        yt = yt[..., : yt.shape[-1] - (k - s)] if k > s else yt
        np.testing.assert_allclose(
            np.asarray(y), yt.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5
        )


def test_conv_transpose_causality(rng):
    x1 = rng.normal(size=(1, 20, 3)).astype(np.float32)
    x2 = x1.copy()
    x2[:, 10:, :] = 0.0
    w = jnp.asarray(rng.normal(size=(9, 3, 4)), dtype=jnp.float32)
    y1 = causal_conv_transpose1d(jnp.asarray(x1), w, stride=4)
    y2 = causal_conv_transpose1d(jnp.asarray(x2), w, stride=4)
    # out sample j depends on inputs >= ceil((j-k+1)/s) ... <= floor(j/s);
    # inputs < 10 only affect outputs j with floor(j/s) <= 9 ... check prefix:
    np.testing.assert_allclose(y1[:, : 10 * 4 - (9 - 4)], y2[:, : 10 * 4 - (9 - 4)], rtol=1e-6)


def test_upsample_nearest():
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
    y = upsample_nearest(x, 3)
    assert y.shape == (1, 9, 2)
    np.testing.assert_array_equal(np.asarray(y[0, :, 0]), [0, 0, 0, 2, 2, 2, 4, 4, 4])


def test_upsample_conv_shape(rng):
    x = jnp.asarray(rng.normal(size=(2, 30, 4)), dtype=jnp.float32)
    w = jnp.asarray(rng.normal(size=(9, 4, 6)), dtype=jnp.float32)
    y = causal_upsample_conv1d(x, w, stride=4)
    assert y.shape == (2, 120, 6)


def test_same_conv_torch_parity(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(2, 40, 3)).astype(np.float32)
    w = rng.normal(size=(7, 3, 5)).astype(np.float32)
    y = same_conv1d(jnp.asarray(x), jnp.asarray(w))
    xt = torch.from_numpy(x.transpose(0, 2, 1))
    wt = torch.from_numpy(w.transpose(2, 1, 0))
    yt = torch.nn.functional.conv1d(xt, wt, padding="same")
    np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


def test_avg_pool_torch_parity(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(2, 50, 3)).astype(np.float32)
    for scale in [1, 2, 4]:
        y = avg_pool1d(jnp.asarray(x), 2 * scale, scale, scale)
        xt = torch.from_numpy(x.transpose(0, 2, 1))
        yt = torch.nn.functional.avg_pool1d(xt, 2 * scale, stride=scale, padding=scale)
        np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 1), rtol=1e-5, atol=1e-6)


def test_box_fold_matches_unfold_sum(rng):
    """box_fold == torch unfold(size, step).sum(-1) (networks/wavelets.py:226)."""
    torch = pytest.importorskip("torch")
    y = rng.normal(size=(2, 3, 96)).astype(np.float32)
    for window, step in [(16, 4), (16, 8), (8, 2), (40, 10)]:
        ours = box_fold(jnp.asarray(y), window, step)
        theirs = torch.from_numpy(y).unfold(-1, window, step).sum(dim=-1)
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-5)


def test_grouped_conv(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(1, 30, 8)).astype(np.float32)
    w = rng.normal(size=(5, 2, 8)).astype(np.float32)  # groups=4: Cin/g=2
    y = causal_conv1d(jnp.asarray(x), jnp.asarray(w), groups=4)
    pad, extra = causal_pad_amounts(30, 5, 1, 1)
    xt = torch.nn.functional.pad(torch.from_numpy(x.transpose(0, 2, 1)), (pad, extra))
    wt = torch.from_numpy(w.transpose(2, 1, 0))
    yt = torch.nn.functional.conv1d(xt, wt, groups=4)
    np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("stride,kernel", [(2, 5), (3, 7), (4, 9), (5, 11), (4, 3)])
def test_upsample_conv_phase_decomposition_exact(rng, stride, kernel):
    """The phase-decomposed upsampler (one low-rate conv + depth-to-space)
    must equal the naive nearest-upsample + same-conv composition — it is the
    same function, relowered for the MXU."""
    from audio_generation_tpu.ops.conv import same_conv1d

    cin, cout, L = 6, 5, 41
    x = jnp.asarray(rng.normal(size=(2, L, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(kernel, cin, cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))

    fast = causal_upsample_conv1d(x, w, b, stride=stride)
    naive = same_conv1d(upsample_nearest(x, stride), w, b)
    assert fast.shape == naive.shape == (2, L * stride, cout)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), rtol=1e-5, atol=1e-5)


class TestFoldedConv:
    """Lane-folded execution (ops/conv.py fold_time law) is exact."""

    def test_folded_matches_unfolded(self, rng):
        from audio_generation_tpu.ops.conv import (
            causal_conv1d, fold_time, folded_causal_conv1d, unfold_time,
        )

        for (L, cin, cout, k, d, f) in [
            (48, 3, 5, 7, 1, 4), (48, 3, 5, 7, 3, 4), (72, 4, 2, 7, 9, 4),
            (72, 2, 2, 1, 1, 6), (64, 5, 3, 5, 2, 2), (60, 1, 32, 7, 1, 4),
        ]:
            x = jnp.asarray(rng.normal(size=(2, L, cin)).astype(np.float32))
            w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
            b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
            ref = causal_conv1d(x, w, b, dilation=d)
            out = unfold_time(
                folded_causal_conv1d(fold_time(x, f), w, b, fold=f, dilation=d),
                f, cout,
            )
            np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)

    def test_polyphase_dilated_matches_plain(self, rng):
        """polyphase_dilated_conv1d (phase-to-batch transpose + folded d=1
        conv) equals the plain dilated causal conv to f32 rounding."""
        from audio_generation_tpu.ops.conv import (
            causal_conv1d, polyphase_dilated_conv1d,
        )

        for (L, cin, cout, k, d, f) in [
            (72, 4, 4, 7, 9, 4), (72, 4, 6, 7, 3, 4), (90, 3, 3, 7, 9, 2),
            (54, 5, 5, 7, 3, 2), (66, 2, 2, 5, 3, 1), (60, 4, 4, 7, 1, 4),
            (63, 4, 4, 7, 9, 4),  # L/d=7 not divisible by f -> inner f=1
        ]:
            x = jnp.asarray(rng.normal(size=(2, L, cin)).astype(np.float32))
            w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
            b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
            ref = causal_conv1d(x, w, b, dilation=d)
            out = polyphase_dilated_conv1d(x, w, b, dilation=d, fold=f)
            assert out.shape == ref.shape
            np.testing.assert_allclose(
                np.asarray(ref), np.asarray(out), atol=1e-5,
                err_msg=f"L={L} d={d} f={f}",
            )

    def test_aligned_dilated_matches_plain(self, rng):
        """aligned_dilated_conv1d (fold f=d, grouped conv) is BIT-exact vs
        the plain dilated causal conv: same tap sums, reindexed."""
        from audio_generation_tpu.ops.conv import (
            aligned_dilated_conv1d, causal_conv1d,
        )

        for (L, cin, cout, k, d) in [
            (72, 4, 4, 7, 9), (72, 4, 6, 7, 3), (90, 3, 5, 7, 9),
            (54, 5, 5, 7, 3), (66, 2, 2, 5, 3), (60, 4, 4, 7, 1),
        ]:
            x = jnp.asarray(rng.normal(size=(2, L, cin)).astype(np.float32))
            w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
            b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
            ref = causal_conv1d(x, w, b, dilation=d)
            out = aligned_dilated_conv1d(x, w, b, dilation=d)
            assert out.shape == ref.shape
            assert (np.asarray(ref) == np.asarray(out)).all(), f"L={L} d={d}"

    def test_model_forward_fold_invariant(self, rng):
        """CausalVQAE(lane_fold=True) ≈ (lane_fold=False): same params, same
        codes, tolerance-matched waveforms."""
        from audio_generation_tpu.models import CausalVQAE

        kw = dict(
            in_channels=1, n_blocks=2, n_layers_per_block=3,
            first_block_channels=8, num_quantizers=2, codebook_size=32,
            codebook_dim=16, strides=(2, 3), wavelet_decoders=(False, True),
            input_format="n c l", use_som=False, vq_type="ema",
        )
        m_plain = CausalVQAE(lane_fold=False, **kw)
        x = jnp.asarray(rng.normal(size=(2, 1, 4 * 48)).astype(np.float32) * 0.3)
        variables = m_plain.init(jax.random.key(0), x)
        (y0, c0, i0), _ = m_plain.apply(variables, x, mutable=["codebook"])
        for mode in [True, "enc", "dec"]:
            m_fold = CausalVQAE(lane_fold=mode, **kw)
            (y1, c1, i1), _ = m_fold.apply(variables, x, mutable=["codebook"])
            assert (np.asarray(i0) == np.asarray(i1)).all(), mode
            np.testing.assert_allclose(
                np.asarray(y0), np.asarray(y1), atol=2e-5, err_msg=str(mode)
            )
