"""audio_generation_tpu — a TPU-native (JAX/XLA/Pallas) neural audio codec framework.

A from-scratch, TPU-first re-design of the capabilities of
LumenPallidium/audio_generation (see SURVEY.md): a Soundstream/EnCodec-style
VQ-GAN neural audio codec with

  * a fully causal convolutional encoder (reference: networks/vae.py:14-148),
  * a residual vector quantizer with EMA and self-organizing-map codebooks
    (reference: external `som_quantizer`, API per networks/vae.py:245-251),
  * causal upsampling / learned-wavelet decoders (networks/vae.py:150-202,
    networks/wavelets.py),
  * multi-scale waveform + STFT discriminators and multispectral mel losses
    (networks/discriminator.py, networks/training.py:51-78),
  * a mini-epoch GAN trainer with gradient accumulation, one-sampled
    discriminators and codebook dropout (networks/training.py:90-533).

Everything is pure-functional JAX: params/state are pytrees, the train step is
one jitted function (grad accumulation via `lax.scan`), codebook updates are
pure state transitions, and parallelism is expressed with `jax.sharding.Mesh`
+ NamedSharding (data/model axes) rather than any host-side comm library.
"""

__version__ = "0.1.0"

from audio_generation_tpu import config as config  # noqa: F401
