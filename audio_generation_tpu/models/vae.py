"""CausalVQAE — the Soundstream-style codec generator.

Reference: networks/vae.py:204-351. Encoder = Conv(k=7) stem ->
n_blocks x CausalEncoderBlock (strides (2,3,4,4,5), channels 32*2^i) ->
Conv(k=3) to codebook_dim; bottleneck = ResidualQuantizer (or an
energy-transformer, swappable); decoder = ConvT(k=7) stem ->
n_blocks x CausalDecoderBlock (reversed strides, per-block wavelet flags) ->
Conv(k=7) back to in_channels. Total stride = prod(strides) = 480 by default,
so the latent has ceil(L_samples / 480) frames.

Functional-state design: codebook EMA/SOM state lives in the 'codebook'
variable collection (mutable during training, exactly like batch stats), so
`model.apply(..., mutable=['codebook'])` is the whole train-time protocol and
checkpointing is uniform. `codebook_n` (bitrate dropout) and
`update_codebook` are traced values — one compiled step serves all settings.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audio_generation_tpu.models.blocks import CausalDecoderBlock, CausalEncoderBlock
from audio_generation_tpu.models.layers import CausalConv1d, CausalConvT1d
from audio_generation_tpu.models.quantizer import QuantizerState, ResidualQuantizer


class CausalVQAE(nn.Module):
    """Args mirror the reference ctor (networks/vae.py:205-223); see
    config.VAEConfig for the YAML mapping."""

    in_channels: int = 1
    n_blocks: int = 5
    n_layers_per_block: int = 4
    first_block_channels: int = 32
    num_quantizers: int = 8
    codebook_size: Any = 1024
    codebook_dim: int = 512
    vq_cutoff_freq: float = 1.0
    vq_type: str = "ema"
    strides: Sequence[int] = (2, 3, 4, 4, 5)
    input_format: str = "b l c"
    channel_multiplier: int = 2
    depthwise: bool = False
    use_som: bool = True
    som_kernel_type: str = "hard"
    differentiable_som: bool = False
    som_temperature: float = 1.0
    wavelet_decoders: Any = (False, True, False, False, False)
    bottleneck: str = "rvq"  # "rvq" | "energy" | "energy_rvq" | "none" —
    # "energy_rvq" runs the energy-transformer descent and then CODES the
    # post-descent tokens with the residual quantizer, giving the
    # reference's "much stronger than RVQ" bottleneck (README.md:56) a real
    # coded-transmission bitrate (VERDICT r3 task 8): indices decode through
    # the ordinary decode_indices path, so the .agc bitstream / codec CLI
    # work unchanged for this variant.
    energy_kwargs: Any = None  # dict for the energy bottleneck
    compute_dtype: Any = jnp.float32
    lane_fold: Any = True  # exact lane-folded execution of low-channel
    # residual stacks (ops/conv.py fold_time law); param shapes unchanged.
    # True = everywhere, False = off, "enc"/"dec" = that side only.
    # Same-process sweep (v5e, b32x3s bf16, p50 of 10): True 81.2 ms,
    # "dec" 82.8, "enc" 86.5, False 86.9 => fold everywhere.
    remat_blocks: bool = False  # rematerialize encoder/decoder blocks in the
    # backward pass (jax.checkpoint): trades ~20-30% step FLOPs for bounding
    # resident activations to block inputs — required for the reference-scale
    # batch 4 x accum 32 x 72000 GAN step on a 16 GB v5e
    use_pallas_rvq: bool = False  # inference-only fused RVQ kernel
    # (ops/rvq_pallas.py); bit-exact indices, no codebook updates
    use_pallas_stack: bool = False  # fused VMEM-resident residual stacks
    # (ops/stack_pallas.py): one HBM round trip per stack instead of one per
    # conv; same math/params, differentiable (custom VJP recomputes via XLA)
    restart_stale_codebooks: bool = False  # dead-entry reactivation
    # (models/quantizer.py restart_stale; off = reference parity)

    @property
    def scale_factor(self) -> int:
        return int(np.prod(self.strides))

    def _fold_enabled(self, side: str) -> bool:
        if isinstance(self.lane_fold, str):
            return self.lane_fold in ("enc", "encoder") if side == "enc" else (
                self.lane_fold in ("dec", "decoder")
            )
        return bool(self.lane_fold)

    @property
    def quantizer(self) -> ResidualQuantizer:
        return ResidualQuantizer(
            num_quantizers=self.num_quantizers,
            dim=self.codebook_dim,
            codebook_sizes=self.codebook_size,
            quantizer_class=self.vq_type,
            vq_cutoff_freq=self.vq_cutoff_freq,
            use_som=self.use_som,
            som_kernel_type=self.som_kernel_type,
            differentiable_som=self.differentiable_som,
            som_temperature=self.som_temperature,
            restart_stale=self.restart_stale_codebooks,
        )

    def _channel_sizes(self):
        return [
            self.first_block_channels * self.channel_multiplier**i
            for i in range(self.n_blocks + 1)
        ]

    def _wavelet_flags(self):
        flags = self.wavelet_decoders
        if isinstance(flags, (list, tuple)):
            assert len(flags) == self.n_blocks, "wavelet_decoders length mismatch"
            return list(flags)[::-1]  # reference reverses (vae.py:237-241)
        return [bool(flags)] * self.n_blocks

    # ------------------------------------------------------------------ #
    def setup(self):
        chans = self._channel_sizes()
        wavelet_flags = self._wavelet_flags()

        self.enc_stem = CausalConv1d(features=chans[0], kernel_size=7)
        self.enc_blocks = [
            CausalEncoderBlock(
                out_channels=chans[i + 1],
                stride=self.strides[i],
                n_layers=self.n_layers_per_block,
                depthwise=self.depthwise,
                lane_fold=self._fold_enabled("enc"),
                remat=self.remat_blocks,
                pallas_stack=self.use_pallas_stack,
            )
            for i in range(self.n_blocks)
        ]
        self.enc_out = CausalConv1d(features=self.codebook_dim, kernel_size=3)

        self.dec_stem = CausalConvT1d(features=chans[-1], kernel_size=7)
        self.dec_blocks = [
            CausalDecoderBlock(
                out_channels=chans[i - 1],
                stride=self.strides[i - 1],
                n_layers=self.n_layers_per_block,
                depthwise=self.depthwise,
                wavelet=wavelet_flags[i - 1],
                lane_fold=self._fold_enabled("dec"),
                remat=self.remat_blocks,
                pallas_stack=self.use_pallas_stack,
            )
            for i in range(self.n_blocks, 0, -1)
        ]
        self.dec_out = CausalConv1d(features=self.in_channels, kernel_size=7)

        if self.bottleneck in ("energy", "energy_rvq"):
            from audio_generation_tpu.models.energy import EnergyTransformer

            kwargs = dict(self.energy_kwargs or {})
            kwargs.setdefault("dim", self.codebook_dim)
            self.energy_bottleneck = EnergyTransformer(**kwargs)

        if self.bottleneck in ("rvq", "energy_rvq"):
            q = self.quantizer
            self.qstate = self.variable(
                "codebook",
                "state",
                lambda: q.init_state(
                    self.make_rng("params")
                    if self.has_rng("params")
                    else jax.random.key(0)
                ),
            )

    def _to_blc(self, x):
        if self.input_format == "b l c":
            return x
        return jnp.swapaxes(x, 1, 2)  # "n c l" -> (B, L, C)

    def _from_blc(self, x):
        if self.input_format == "b l c":
            return x
        return jnp.swapaxes(x, 1, 2)

    # ------------------------------------------------------------------ #
    def encoder_fn(self, x):
        """Raw encoder stack: (B, L, Cin) -> (B, ceil(L/480), codebook_dim).

        The stem conv (Cin=1 at the full sample rate: 7-wide contraction, 32
        output lanes — the most lane-starved op in the codec) runs in the
        fold_time layout and feeds block 0's folded residual stack directly."""
        from audio_generation_tpu.models.blocks import _pick_fold
        from audio_generation_tpu.ops.conv import fold_time

        f0 = 1
        if self._fold_enabled("enc") and not self.depthwise:
            f0 = _pick_fold(x.shape[1], self.first_block_channels)
        if f0 > 1:
            x = self.enc_stem(fold_time(x, f0), fold=f0)
        else:
            x = self.enc_stem(x)
        x = self.enc_blocks[0](x, in_fold=f0)
        for block in self.enc_blocks[1:]:
            x = block(x)
        return self.enc_out(x)

    def decoder_fn(self, z):
        """Raw decoder stack: (B, L_latent, codebook_dim) -> (B, L, Cin)."""
        x = self.dec_stem(z)
        for block in self.dec_blocks:
            x = block(x)
        return self.dec_out(x)

    def _quantizer_state(self):
        return self.qstate

    def bottleneck_fn(self, z, update_codebook=False, codebook_n=None, prioritize_early=False):
        """(B, L, D) -> (z_q, indices, commit_loss); threads codebook state."""
        if self.bottleneck == "none":
            idx = jnp.zeros(z.shape[:2] + (self.num_quantizers,), jnp.int32)
            return z, idx, jnp.float32(0.0)
        if self.bottleneck == "energy":
            z_q, aux = self.energy_bottleneck(z.astype(jnp.float32))
            idx = jnp.zeros(z.shape[:2] + (self.num_quantizers,), jnp.int32)
            return z_q.astype(z.dtype), idx, aux
        if self.bottleneck == "energy_rvq":
            # energy descent shapes the tokens, the RVQ cascade CODES them:
            # straight-through gradients reach the descent (and the encoder
            # through it) exactly as they reach a plain encoder output
            z_e, aux = self.energy_bottleneck(z.astype(jnp.float32))
            z_q, indices, commit = self._rvq_bottleneck(
                z_e.astype(z.dtype), update_codebook, codebook_n, prioritize_early
            )
            return z_q, indices, commit + aux
        return self._rvq_bottleneck(z, update_codebook, codebook_n, prioritize_early)

    def _rvq_bottleneck(self, z, update_codebook, codebook_n, prioritize_early):
        q = self.quantizer
        state_var = self._quantizer_state()
        if self.use_pallas_rvq and not self.is_initializing():
            from audio_generation_tpu.ops.rvq_pallas import rvq_encode

            B, L, D = z.shape
            flat = z.astype(jnp.float32).reshape(B * L, D)
            idx, qsum = rvq_encode(flat, state_var.value.codebooks)
            z_q = flat + jax.lax.stop_gradient(qsum - flat)
            return (
                z_q.reshape(B, L, D).astype(z.dtype),
                idx.reshape(B, L, self.num_quantizers),
                jnp.float32(0.0),
            )
        z_q, indices, commit, new_state = q(
            state_var.value,
            z.astype(jnp.float32),
            codebook_n=codebook_n,
            update_codebook=update_codebook,
            prioritize_early=prioritize_early,
        )
        if not self.is_initializing() and state_var.is_mutable():
            state_var.value = new_state
        return z_q.astype(z.dtype), indices, commit

    # ------------------------------------------------------------------ #
    def __call__(self, x, update_codebook=False, codebook_n=None, prioritize_early=False):
        """Full forward (reference: networks/vae.py:293-305).

        Returns (y, commit_loss, indices); y in `input_format` layout.
        """
        z_q, commit, indices = self.encode(
            x, update_codebook=update_codebook, codebook_n=codebook_n,
            prioritize_early=prioritize_early,
        )
        y = self.decoder_fn(z_q.astype(self.compute_dtype))
        return self._from_blc(y).astype(jnp.float32), commit, indices

    def encode(self, x, update_codebook=False, codebook_n=None, prioritize_early=False):
        """Encode + quantize (reference: networks/vae.py:307-322).

        Returns (z_q (B, L_latent, D), commit_loss, indices (B, L_latent, nq)).
        """
        x = self._to_blc(x).astype(self.compute_dtype)
        z = self.encoder_fn(x)
        z_q, indices, commit = self.bottleneck_fn(
            z, update_codebook=update_codebook, codebook_n=codebook_n,
            prioritize_early=prioritize_early,
        )
        return z_q, commit, indices

    def decode(self, z_q):
        """Decode quantized latents (B, L_latent, D) -> waveform in
        `input_format` layout."""
        y = self.decoder_fn(z_q.astype(self.compute_dtype))
        return self._from_blc(y).astype(jnp.float32)

    def decode_indices(self, indices):
        """Codes (B, L_latent, nq) -> waveform; the codec 'decoder side'."""
        q = self.quantizer
        state = self._quantizer_state().value
        z_q = q.dequantize(state, indices)
        return self.decode(z_q)

    def sample(self, rng, length: int = 225):
        """Unconditional generation: random indices per level -> dequantize
        -> sum -> decode (reference: networks/vae.py:324-345)."""
        sizes = self.quantizer.codebook_sizes
        keys = jax.random.split(rng, self.num_quantizers)
        idx = jnp.stack(
            [
                jax.random.randint(keys[i], (1, length), 0, sizes[i])
                for i in range(self.num_quantizers)
            ],
            axis=-1,
        )  # (1, length, nq)
        return self.decode_indices(idx)


def model_from_config(cfg) -> CausalVQAE:
    """Build a CausalVQAE from config.VAEConfig (YAML `vae_args`)."""
    return CausalVQAE(
        in_channels=cfg.in_channels,
        n_blocks=cfg.n_blocks,
        n_layers_per_block=cfg.n_layers_per_block,
        first_block_channels=cfg.first_block_channels,
        num_quantizers=cfg.num_quantizers,
        codebook_size=cfg.codebook_size,
        codebook_dim=cfg.codebook_dim,
        vq_cutoff_freq=cfg.vq_cutoff_freq,
        vq_type=cfg.vq_type,
        strides=tuple(cfg.strides),
        input_format=cfg.input_format,
        channel_multiplier=cfg.channel_multiplier,
        depthwise=cfg.depthwise,
        use_som=cfg.use_som,
        som_kernel_type=cfg.som_kernel_type,
        differentiable_som=cfg.differentiable_som,
        som_temperature=cfg.som_temperature,
        wavelet_decoders=tuple(cfg.wavelet_decoders)
        if isinstance(cfg.wavelet_decoders, (list, tuple))
        else cfg.wavelet_decoders,
        bottleneck=cfg.bottleneck,
        energy_kwargs=cfg.energy_kwargs,
        remat_blocks=cfg.remat_blocks,
        lane_fold=cfg.lane_fold,
        use_pallas_rvq=cfg.use_pallas_rvq,
        use_pallas_stack=cfg.use_pallas_stack,
        restart_stale_codebooks=cfg.restart_stale_codebooks,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
    )
