"""reconvat-tpu: TPU-native (JAX/XLA/Pallas) semi-supervised automatic
music transcription framework with the capabilities of ReconVAT.

Layers (see SURVEY.md for the reference mapping):
    constants      — signal-chain constants (16 kHz, hop 512, 88 keys, ...)
    ops            — DSP frontends (Mel/CQT/CFP/...), Pallas kernels,
                     normalization
    nn             — local windowed attention, U-Net blocks, conv/LSTM
                     stacks
    models         — the model zoo (ReconVAT, UNet_Onset, Onsets&Frames,
                     Thickstun, Segmentation, Prestack, attention models)
    vat            — the generic Virtual Adversarial Training transform
    data           — datasets (MAPS/MAESTRO/MusicNet/...), audio decode
                     (native C++ FLAC), MIDI I/O, loaders
    train          — train state/steps, driver, checkpoints, torch weight
                     conversion
    parallel       — dp x sp device-mesh sharding
    decode         — posteriogram -> note events (native fast path)
    metrics        — mir_eval-compatible note/frame metrics
    evaluate       — full-song evaluation with reference-identical keys
"""
from . import constants  # noqa: F401

__version__ = "0.1.0"
