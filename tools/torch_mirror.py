"""Torch mirror of the reference generator stack, for end-to-end parity.

BASELINE.json:5 demands "tolerance-matched waveform reconstructions against
the PyTorch networks/vae.py models". This module builds the reference's
encoder+decoder architecture in torch (CPU) from the behavioral spec —
the causal pad law (networks/vae.py:32,39-43), the ConvT right-crop
(networks/vae.py:58-64), the upsample-then-same-conv upsampler
(networks/vae.py:66-89), the residual blocks (networks/vae.py:91-117), the
encoder/decoder block geometry (networks/vae.py:119-202) and the literal
WaveletLayer overlap-add (networks/wavelets.py:123-231) — and provides
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


class WaveletLayer(torch.nn.Module):
    """The LITERAL reference formulation (networks/wavelets.py:123-231):
    conv_in (padding='same') -> unsqueeze a wavelet axis -> multiply by the
    Gabor kernel cos(space)*exp(-space^2/scale) -> flatten (l s) -> overlap-
    add via unfold(n_points, fold_dim).sum(-1) -> negative-size-diff tail
    patch-up with raw train samples -> conv_out (padding='same').

    This is the independent check of the repo's closed-form two-tap rewrite
    (audio_generation_tpu/models/wavelets.py:158-189)."""

    def __init__(self, cin, hidden, cout=None, wavelet_kernel_size=13,
                 out_conv_kernel_size=3, scale_factor=2, n_points=16,
                 interval=(-10.0, 10.0), wavelet_scale=40.0,
                 channelwise_scale=True):
        super().__init__()
        assert n_points % scale_factor == 0
        cout = cin if cout is None else cout
        self.n_points = n_points
        self.scale_factor = scale_factor
        self.fold_dim = n_points // scale_factor
        self.conv_in = torch.nn.Conv1d(cin, hidden, wavelet_kernel_size, padding="same")
        self.conv_out = torch.nn.Conv1d(hidden, cout, out_conv_kernel_size, padding="same")
        space = torch.linspace(interval[0], interval[1], n_points).view(1, 1, 1, n_points)
        self.register_buffer("space", space)
        self.register_buffer("cos_kernel", torch.cos(space))
        ws = torch.tensor(float(wavelet_scale))
        if channelwise_scale:
            ws = ws.repeat(hidden).view(1, hidden, 1, 1)
        self.wavelet_scale = torch.nn.Parameter(ws)

    def forward(self, x):
        x = self.conv_in(x).unsqueeze(-1)  # (b, h, l, 1)
        y = self.cos_kernel * torch.exp(-(self.space**2) / self.wavelet_scale) * x
        b, c, l, s = y.shape
        y = y.reshape(b, c, l * s)  # "b c l s -> b c (l s)"
        expected_length = y.shape[-1] // self.fold_dim
        y_out = y.unfold(-1, self.n_points, self.fold_dim).sum(dim=-1)
        size_diff = y_out.shape[-1] - expected_length
        if size_diff < 0:
            y_out = torch.cat([y_out, y[..., size_diff:]], dim=-1)
        return self.conv_out(y_out)


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
    """Upsampler then res blocks (networks/vae.py:150-202): WaveletLayer when
    the block's wavelet flag is set (networks/vae.py:166-175), else the
    checkerboard-free upsample variant."""

    def __init__(self, cin, cout, stride, n_layers=4, wavelet=False,
                 wavelet_hidden_ratio=4):
        super().__init__()
        self.wavelet = wavelet
        if wavelet:
            self.up = WaveletLayer(
                cin, cout * wavelet_hidden_ratio, cout,
                wavelet_kernel_size=2 * stride + 1,
                scale_factor=stride,
                n_points=2 * stride * wavelet_hidden_ratio,
                channelwise_scale=True,
            )
        else:
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
                 channel_multiplier=2, wavelet_decoders=None):
        super().__init__()
        chans = [first_block_channels * channel_multiplier**i for i in range(n_blocks + 1)]
        # per-block wavelet flags in config order; the decoder consumes them
        # REVERSED like the reference (networks/vae.py:237-241)
        wavelet_decoders = list(wavelet_decoders or [False] * n_blocks)[::-1]
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
                CausalDecoderBlock(chans[i], chans[i - 1], strides[i - 1],
                                   n_layers_per_block,
                                   wavelet=wavelet_decoders[i - 1])
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


def _load_plain_conv(tconv: torch.nn.Conv1d, p):
    """Load a flax SameConv1d (K, Cin, Cout) into a bare torch Conv1d."""
    w, b = _effective_weight(p)
    tconv.weight.data = torch.from_numpy(np.ascontiguousarray(w.transpose(2, 1, 0)))
    tconv.bias.data = torch.from_numpy(b)


def _load_wavelet(twl: WaveletLayer, p):
    _load_plain_conv(twl.conv_in, p["conv_in"])
    _load_plain_conv(twl.conv_out, p["conv_out"])
    ws = np.asarray(p["wavelet_scale"], dtype=np.float64)
    if ws.ndim == 2:  # flax channelwise (H, 1) -> torch (1, H, 1, 1)
        twl.wavelet_scale.data = torch.from_numpy(ws.reshape(1, -1, 1, 1))
    else:
        twl.wavelet_scale.data = torch.from_numpy(ws.reshape(()))


def transplant(torch_model: TorchCodec, flax_params: dict, n_layers_per_block=4):
    """Copy a flax CausalVQAE's (weight-norm-resolved) generator weights into
    the torch mirror. flax_params is variables['params'] of a model whose
    wavelet_decoders flags match the mirror's."""
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
        if blk.wavelet:
            _load_wavelet(blk.up, bp["up_wavelet"])
        else:
            _load_conv(blk.up, bp["up"])
        for j, r in enumerate(blk.res):
            _load_res(r, bp[f"res{j}"])
    _load_conv(torch_model.dec_out, flax_params["dec_out"])
    return torch_model.double()


# --------------------------------------------------------------------------- #
# Discriminator mirrors (VERDICT r3 task 7): the reference adversaries
# (networks/discriminator.py:7-197) rebuilt in torch AS PARITY FIXTURES, so
# score/feature/hinge/feature-matching parity is checked against torch rather
# than only self-derived formula goldens. norm="none" (architectural parity);
# spectral norm is parity-tested separately at the single-conv level
# (tests/test_torch_parity.py) because torch's persistent power-iteration `u`
# is RNG-init'ed and can only be matched by transplanting the state vector.
# --------------------------------------------------------------------------- #

class TorchWaveformDiscBlock(torch.nn.Module):
    """Mirror of models/discriminators.WaveformDiscriminatorBlock
    (reference: networks/discriminator.py:7-56)."""

    def __init__(self, in_channels=1, channel_sizes=(4, 8, 8),
                 kernel_sizes=(15, 41, 5), strides=(1, 4, 1),
                 groups=(1, 2, 1), scale=1):
        super().__init__()
        chans = [in_channels] + list(channel_sizes)
        self.pool = torch.nn.AvgPool1d(2 * scale, stride=scale, padding=scale)
        self.convs = torch.nn.ModuleList(
            torch.nn.Conv1d(chans[i], chans[i + 1], kernel_sizes[i],
                            stride=strides[i], groups=groups[i])
            for i in range(len(channel_sizes) - 1)
        )
        self.conv_out = torch.nn.Conv1d(
            chans[-2], 1, kernel_sizes[-1], stride=strides[-1],
            groups=groups[-1],
        )
        self.act = torch.nn.LeakyReLU(0.2)

    def forward(self, x):
        features = []
        x = self.pool(x)
        features.append(x)
        for conv in self.convs:
            x = self.act(conv(x))
            features.append(x)
        x = self.conv_out(x)
        features.append(x)
        return torch.sigmoid(x), features


class TorchSTFTDisc(torch.nn.Module):
    """Mirror of models/discriminators.STFTDiscriminator
    (reference: networks/discriminator.py:85-197)."""

    def __init__(self, win_length=128, first_channel_size=4,
                 channel_multipliers=(2, 2, 1, 2, 1, 2),
                 strides=((1, 2), (2, 2)) * 3):
        super().__init__()
        self.win_length = win_length
        self.first_conv = torch.nn.Conv2d(2, first_channel_size, 7, padding=3)
        self.act = torch.nn.LeakyReLU(0.2)
        blocks = []
        c = first_channel_size
        for mult, (sh, sw) in zip(channel_multipliers, strides):
            conv1 = torch.nn.Conv2d(c, c, 3, padding=1)
            conv2 = torch.nn.Conv2d(
                c, c * mult, (sh + 2, sw + 2), stride=(sh, sw),
                padding=((sh + 1) // 2, (sw + 1) // 2),
            )
            blocks.append(torch.nn.ModuleList([conv1, conv2]))
            c = c * mult
        self.blocks = torch.nn.ModuleList(blocks)
        fk = win_length // (2 ** (len(channel_multipliers) + 1))
        self.final_conv = torch.nn.Conv2d(
            c, 1, (1, fk), padding=(0, (fk - 1) // 2)
        )

    def forward(self, x):
        # x: (B, 1, L) -> two-sided normalized rectangular-window STFT
        x = x.squeeze(1)
        x = torch.stft(x, n_fft=self.win_length,
                       hop_length=self.win_length // 4,
                       win_length=self.win_length, normalized=True,
                       return_complex=False, onesided=False)
        x = x.permute(0, 3, 2, 1)  # b f t c -> b c t f
        x = self.first_conv(x)
        features = [x]
        for conv1, conv2 in self.blocks:
            x = conv2(self.act(conv1(x)))
            features.append(x)
        x = self.final_conv(x)
        return [torch.sigmoid(x)], features


def _load_conv1d_raw(tconv: torch.nn.Conv1d, p):
    w, b = _effective_weight(p)  # (K, Cin/g, Cout)
    tconv.weight.data = torch.from_numpy(np.ascontiguousarray(w.transpose(2, 1, 0)))
    tconv.bias.data = torch.from_numpy(b)


def _load_conv2d_raw(tconv: torch.nn.Conv2d, p):
    w, b = _effective_weight(p)  # flax (kh, kw, Cin, Cout)
    tconv.weight.data = torch.from_numpy(
        np.ascontiguousarray(w.transpose(3, 2, 0, 1))
    )
    tconv.bias.data = torch.from_numpy(b)


def transplant_waveform_block(tm: TorchWaveformDiscBlock, flax_params: dict):
    for i, conv in enumerate(tm.convs):
        _load_conv1d_raw(conv, flax_params[f"conv{i}"])
    _load_conv1d_raw(tm.conv_out, flax_params["conv_out"])
    return tm.double()


def transplant_stft_disc(tm: TorchSTFTDisc, flax_params: dict):
    _load_conv2d_raw(tm.first_conv, flax_params["first_conv"])
    for i, (conv1, conv2) in enumerate(tm.blocks):
        _load_conv2d_raw(conv1, flax_params[f"block{i}"]["conv1"])
        _load_conv2d_raw(conv2, flax_params[f"block{i}"]["conv2"])
    _load_conv2d_raw(tm.final_conv, flax_params["final_conv"])
    return tm.double()
