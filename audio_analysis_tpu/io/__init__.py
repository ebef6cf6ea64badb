"""Host-side I/O: WAV read/write, bundle contract, native fast path."""

from audio_analysis_tpu.io.wav import (  # noqa: F401
    DEFAULT_EXPECTED_SAMPLE_RATE_HZ,
    ChannelMode,
    LoadedAudio,
    convert_wav_samples_to_float32,
    downmix_to_mono,
    duplicate_mono_to_stereo,
    ensure_2d_channel_array,
    get_analysis_channels,
    get_channel,
    get_left_right,
    load_wav_file,
    validate_audio_format,
    write_wav_float32,
    write_wav_pcm16,
)
from audio_analysis_tpu.io.bundle import (  # noqa: F401
    BundleMeta,
    load_bundle_batch,
    read_bundle_meta,
    write_bundle,
)
