"""Model zoo. Import from submodules (kept lazy to avoid pulling every
frontend at package import):

    from reconvat_tpu.models.reconvat import ReconVAT
    from reconvat_tpu.models.unet_onset import UNetOnset
    from reconvat_tpu.models.onsets_frames import (OnsetsAndFrames,
        FrameStackVAT, OnsetStackVAT)
    from reconvat_tpu.models.thickstun import Thickstun
    from reconvat_tpu.models.segmentation import SemanticSegmentation
    from reconvat_tpu.models.prestack import Prestack
    from reconvat_tpu.models.attention_models import (VATSelfAttention1D,
        VATCNNAttention1D, VATCNNAttentionOnsetFrame,
        OnsetsAndFramesSelfAttention, SimpleOnsetFrame,
        StandaloneSelfAttention1D, StandaloneSelfAttention2D, Reconstructor)
"""

MODEL_REGISTRY = {
    "ReconVAT": ("reconvat_tpu.models.reconvat", "ReconVAT"),
    "UNet_Onset": ("reconvat_tpu.models.unet_onset", "UNetOnset"),
    "OnsetsAndFrames": ("reconvat_tpu.models.onsets_frames",
                        "OnsetsAndFrames"),
    "FrameStack": ("reconvat_tpu.models.onsets_frames", "FrameStackVAT"),
    "OnsetStack": ("reconvat_tpu.models.onsets_frames", "OnsetStackVAT"),
    "Thickstun": ("reconvat_tpu.models.thickstun", "Thickstun"),
    "Segmentation": ("reconvat_tpu.models.segmentation",
                     "SemanticSegmentation"),
    "Prestack": ("reconvat_tpu.models.prestack", "Prestack"),
    "VATSelfAttention1D": ("reconvat_tpu.models.attention_models",
                           "VATSelfAttention1D"),
    "VATCNNAttention1D": ("reconvat_tpu.models.attention_models",
                          "VATCNNAttention1D"),
    "VATCNNAttentionOnsetFrame": ("reconvat_tpu.models.attention_models",
                                  "VATCNNAttentionOnsetFrame"),
    "OnsetsAndFramesSelfAttention": ("reconvat_tpu.models.attention_models",
                                     "OnsetsAndFramesSelfAttention"),
    "SimpleOnsetFrame": ("reconvat_tpu.models.attention_models",
                         "SimpleOnsetFrame"),
    "StandaloneSelfAttention1D": ("reconvat_tpu.models.attention_models",
                                  "StandaloneSelfAttention1D"),
    "StandaloneSelfAttention2D": ("reconvat_tpu.models.attention_models",
                                  "StandaloneSelfAttention2D"),
    "Reconstructor": ("reconvat_tpu.models.attention_models",
                      "Reconstructor"),
}


def get_model(name: str, **kwargs):
    """Instantiate a model from the registry by name."""
    import importlib

    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: "
                       f"{sorted(MODEL_REGISTRY)}")
    module_name, cls_name = MODEL_REGISTRY[name]
    return getattr(importlib.import_module(module_name), cls_name)(**kwargs)
