from audio_generation_tpu.data.collator import collate  # noqa: F401
from audio_generation_tpu.data.datasets import (  # noqa: F401
    CommonVoice,
    LibriSpeech,
    SyntheticAudio,
    get_dataset,
    introduce_disharmony,
    overtones,
    simple_mixed_sin,
)
from audio_generation_tpu.data.wavio import read_wav, write_wav  # noqa: F401
from audio_generation_tpu.data.loader import PrefetchIterator, prefetch  # noqa: F401
