from audio_generation_tpu.ops.conv import (  # noqa: F401
    avg_pool1d,
    box_fold,
    causal_conv1d,
    causal_conv1d_out_length,
    causal_conv_transpose1d,
    causal_pad_amounts,
    causal_upsample_conv1d,
    conv2d_same,
    same_conv1d,
    upsample_nearest,
)
from audio_generation_tpu.ops.activations import (  # noqa: F401
    glu,
    leaky_relu,
    snake,
    snake_relu,
)
from audio_generation_tpu.ops.signal import (  # noqa: F401
    biquad,
    lowpass_biquad,
    lowpass_biquad_coeffs,
    preemphasis,
    resample,
)
from audio_generation_tpu.ops.stft import (  # noqa: F401
    MelSpectrogram,
    make_mel_bank,
    mel_filterbank,
    stft_real_imag,
)
