"""Torch mirror of the reference generator stack, for end-to-end parity.

BASELINE.json:5 demands "tolerance-matched waveform reconstructions against
the PyTorch networks/vae.py models". This module builds the reference's
encoder+decoder architecture in torch (CPU) from the behavioral spec —
the causal pad law (networks/vae.py:32,39-43), the ConvT right-crop
(networks/vae.py:58-64), the upsample-then-same-conv upsampler
(networks/vae.py:66-89), the residual blocks (networks/vae.py:91-117) and
the encoder/decoder block geometry (networks/vae.py:119-202) — and provides
a weight transplant from the flax CausalVQAE so the SAME weights run through
both stacks. The bottleneck is identity (the quantizer has no torch
counterpart in the reference tree; op-level RVQ parity is covered by the
quantizer tests).

Used by tests/test_torch_parity.py and tools/parity_check.py.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


class CausalConv1d(torch.nn.Module):
    """Reference pad law: left pad d(k-1)-s+1 plus computed right extra pad so
    out_len == ceil(L/s) (networks/vae.py:14-43)."""

    def __init__(self, cin, cout, kernel_size, stride=1, dilation=1):
        super().__init__()
        self.conv = torch.nn.Conv1d(cin, cout, kernel_size, stride=stride, dilation=dilation)
        self.k, self.s, self.d = kernel_size, stride, dilation

    def forward(self, x):
        k, s, d = self.k, self.s, self.d
        L = x.shape[-1]
        pad = d * (k - 1) - s + 1
        next_len = (L - k + pad) / s + 1
        target = (math.ceil(next_len) - 1) * s + k - pad
        x = F.pad(x, (pad, target - L))
        return self.conv(x)


class CausalConvT1d(torch.nn.Module):
    """Transposed conv, then crop k - s samples off the right
    (networks/vae.py:45-64)."""

    def __init__(self, cin, cout, kernel_size, stride=1):
        super().__init__()
        self.conv = torch.nn.ConvTranspose1d(cin, cout, kernel_size, stride=stride)
        self.k, self.s = kernel_size, stride

    def forward(self, x):
        y = self.conv(x)
        crop = self.k - self.s
        return y[..., :-crop] if crop > 0 else y


class CausalUpsampleConv1d(torch.nn.Module):
    """Nearest-neighbor upsample then 'same' conv (networks/vae.py:66-89)."""

    def __init__(self, cin, cout, kernel_size, stride=1):
        super().__init__()
        self.conv = torch.nn.Conv1d(cin, cout, kernel_size, padding=(kernel_size - 1) // 2)
        self.s = stride

    def forward(self, x):
        x = F.interpolate(x, scale_factor=self.s, mode="nearest")
        return self.conv(x)


class CausalResidualBlock1d(torch.nn.Module):
    """x + conv1x1(leaky(conv_k(x, dilation))) (networks/vae.py:91-117)."""

    def __init__(self, channels, kernel_size=7, dilation=1):
        super().__init__()
        self.conv1 = CausalConv1d(channels, channels, kernel_size, dilation=dilation)
        self.conv2 = CausalConv1d(channels, channels, 1)

    def forward(self, x):
        h = F.leaky_relu(self.conv1(x), 0.1)
        return x + self.conv2(h)


class CausalEncoderBlock(torch.nn.Module):
    """(n_layers-1) res blocks (dilations 3^i) + strided down conv k=2s+1,
    LeakyReLU(0.1) between all (networks/vae.py:119-148)."""

    def __init__(self, cin, cout, stride, n_layers=4):
        super().__init__()
        self.res = torch.nn.ModuleList(
            [CausalResidualBlock1d(cin, dilation=3**i) for i in range(n_layers - 1)]
        )
        self.down = CausalConv1d(cin, cout, 2 * stride + 1, stride=stride)

    def forward(self, x):
        for r in self.res:
            x = F.leaky_relu(r(x), 0.1)
        return F.leaky_relu(self.down(x), 0.1)


class CausalDecoderBlock(torch.nn.Module):
    """Upsampler then res blocks (networks/vae.py:150-202); the
    checkerboard-free upsample variant (wavelet flags off for parity)."""

    def __init__(self, cin, cout, stride, n_layers=4):
        super().__init__()
        self.up = CausalUpsampleConv1d(cin, cout, 2 * stride + 1, stride=stride)
        self.res = torch.nn.ModuleList(
            [CausalResidualBlock1d(cout, dilation=3**i) for i in range(n_layers - 1)]
        )

    def forward(self, x):
        x = F.leaky_relu(self.up(x), 0.1)
        for r in self.res:
            x = F.leaky_relu(r(x), 0.1)
        return x


class TorchCodec(torch.nn.Module):
    """Reference CausalVQAE encoder+decoder with identity bottleneck
    (networks/vae.py:204-305): Conv(k7) stem -> encoder blocks -> Conv(k3) to
    codebook_dim; ConvT(k7) stem -> decoder blocks (reversed strides) ->
    Conv(k7) to in_channels."""

    def __init__(self, in_channels=1, n_blocks=3, n_layers_per_block=4,
                 first_block_channels=8, codebook_dim=32, strides=(2, 3, 4),
                 channel_multiplier=2):
        super().__init__()
        chans = [first_block_channels * channel_multiplier**i for i in range(n_blocks + 1)]
        self.enc_stem = CausalConv1d(in_channels, chans[0], 7)
        self.enc_blocks = torch.nn.ModuleList(
            [
                CausalEncoderBlock(chans[i], chans[i + 1], strides[i], n_layers_per_block)
                for i in range(n_blocks)
            ]
        )
        self.enc_out = CausalConv1d(chans[-1], codebook_dim, 3)
        self.dec_stem = CausalConvT1d(codebook_dim, chans[-1], 7)
        self.dec_blocks = torch.nn.ModuleList(
            [
                CausalDecoderBlock(chans[i], chans[i - 1], strides[i - 1], n_layers_per_block)
                for i in range(n_blocks, 0, -1)
            ]
        )
        self.dec_out = CausalConv1d(chans[0], in_channels, 7)

    def encode(self, x):
        x = self.enc_stem(x)
        for b in self.enc_blocks:
            x = b(x)
        return self.enc_out(x)

    def decode(self, z):
        x = self.dec_stem(z)
        for b in self.dec_blocks:
            x = b(x)
        return self.dec_out(x)

    def forward(self, x):
        return self.decode(self.encode(x))


# --------------------------------------------------------------------------- #
def _effective_weight(p):
    """Resolve a flax conv param dict to its effective (K, Cin, Cout) weight:
    weight-norm (v, g) -> v * g / ||v|| (per output channel), else raw w."""
    if "v" in p:
        v = np.asarray(p["v"], dtype=np.float64)
        g = np.asarray(p["g"], dtype=np.float64)
        norm = np.linalg.norm(v.reshape(-1, v.shape[-1]), axis=0)
        w = v * (g / np.maximum(norm, 1e-12))
    else:
        w = np.asarray(p["w"], dtype=np.float64)
    b = np.asarray(p["b"], dtype=np.float64) if "b" in p else None
    return w, b


def _load_conv(tmod, p, transposed=False):
    w, b = _effective_weight(p)
    if transposed:
        # flax (K, Cin, Cout) -> torch ConvTranspose1d (Cin, Cout, K)
        tmod.conv.weight.data = torch.from_numpy(np.ascontiguousarray(w.transpose(1, 2, 0)))
    else:
        # flax (K, Cin, Cout) -> torch Conv1d (Cout, Cin, K)
        tmod.conv.weight.data = torch.from_numpy(np.ascontiguousarray(w.transpose(2, 1, 0)))
    tmod.conv.bias.data = torch.from_numpy(b)


def _load_res(tres, p):
    _load_conv(tres.conv1, p["conv1"])
    _load_conv(tres.conv2, p["conv2"])


def transplant(torch_model: TorchCodec, flax_params: dict, n_layers_per_block=4):
    """Copy a flax CausalVQAE's (weight-norm-resolved) generator weights into
    the torch mirror. flax_params is variables['params'] of a model built
    with wavelet_decoders all-False."""
    _load_conv(torch_model.enc_stem, flax_params["enc_stem"])
    for i, blk in enumerate(torch_model.enc_blocks):
        bp = flax_params[f"enc_blocks_{i}"]
        for j, r in enumerate(blk.res):
            _load_res(r, bp[f"res{j}"])
        _load_conv(blk.down, bp["down"])
    _load_conv(torch_model.enc_out, flax_params["enc_out"])
    _load_conv(torch_model.dec_stem, flax_params["dec_stem"], transposed=True)
    for i, blk in enumerate(torch_model.dec_blocks):
        bp = flax_params[f"dec_blocks_{i}"]
        _load_conv(blk.up, bp["up"])
        for j, r in enumerate(blk.res):
            _load_res(r, bp[f"res{j}"])
    _load_conv(torch_model.dec_out, flax_params["dec_out"])
    return torch_model.double()
