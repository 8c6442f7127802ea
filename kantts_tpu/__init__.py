"""kantts_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-design of the KAN-TTS toolchain.

Two-stage neural TTS:
  1. SAM-BERT acoustic model: linguistic symbols -> mel spectrogram
     (FastSpeech-style parallel encoder + variance adaptor + PNCA decoder).
  2. HiFi-GAN vocoder: mel -> waveform (GAN-trained conv generator with
     MSD/MPD/MSpecD discriminators, optional NSF excitation, PQMF multiband).

Capability parity target: modelscope/KAN-TTS (see SURVEY.md at repo root).
The compute path is JAX/Flax compiled by XLA for TPU; auxiliary native code
(f0 extraction, MAS Viterbi) lives in C++ under `native/`.
"""

__version__ = "0.1.0"

# Cross-process compile reuse: on the remote-compile TPU service every
# process otherwise re-pays minutes of compilation per program (resumed
# training segments re-paid the ~10-minute step compile). See
# utils/exec_cache.py; disable with KANTTS_COMPILE_CACHE=0.
from kantts_tpu.utils.exec_cache import enable as _enable_compile_cache

_enable_compile_cache()
