from kantts_tpu.dsp.stft import stft_magnitude, stft_complex, istft, hann_window  # noqa: F401
from kantts_tpu.dsp.mel import (  # noqa: F401
    mel_filterbank,
    melspectrogram,
    amp_to_db,
    db_to_amp,
    normalize_db,
    denormalize_db,
    MelSpectrogramExtractor,
    LossMelSpectrogram,
)
