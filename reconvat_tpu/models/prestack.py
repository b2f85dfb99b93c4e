"""Prestack baseline: U-Net front + ResNet-18 classifier per frame patch.

Port target: reference `Prestack_Model` (`model/Unet_prestack.py:113-176`):
a stride-1 U-Net "prestack" feeding a torchvision resnet18 whose conv1 is
patched to 1 input channel and fc to 88 outputs, applied to 229x25
per-frame patches. The reference iterates patches in a Python loop one at a
time (documented by its authors as crash-prone,
`train_baseline_Prestack.py:114`); here all T patches of a clip run as one
batched device computation. The ResNet-18 is home-grown (torchvision's
graph, reimplemented in flax — no torch.hub at build time).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from .. import constants as C
from ..nn.unet import Decoder, Encoder, torch_conv_init
from ..ops.normalize import Normalization
from ..ops.spectrogram import frontend_precision, make_frontend
from .losses import binary_cross_entropy

N_KEYS = C.N_KEYS


class BasicBlock(nn.Module):
    """torchvision BasicBlock. Submodule names (incl. the `downsample`
    Sequential's 0/1 indices) mirror torchvision's state_dict names so
    `Prestack.load_reference_weights` converts mechanically."""
    features: int
    strides: int = 1
    use_downsample: bool = False
    dtype: str | None = None   # computation dtype; params/BN stay fp32

    def setup(self):
        self.conv1 = nn.Conv(self.features, (3, 3),
                             strides=(self.strides, self.strides),
                             padding=[(1, 1), (1, 1)], use_bias=False,
                             kernel_init=torch_conv_init, dtype=self.dtype)
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.conv2 = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                             use_bias=False, kernel_init=torch_conv_init,
                             dtype=self.dtype)
        self.bn2 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        if self.use_downsample:
            # [conv, bn] like torchvision's downsample Sequential
            self.downsample = [
                nn.Conv(self.features, (1, 1),
                        strides=(self.strides, self.strides),
                        use_bias=False, kernel_init=torch_conv_init,
                        dtype=self.dtype),
                nn.BatchNorm(momentum=0.9, epsilon=1e-5),
            ]

    def __call__(self, x, train: bool):
        identity = x
        out = nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        out = self.bn2(self.conv2(out), use_running_average=not train)
        if self.use_downsample:
            identity = self.downsample[1](self.downsample[0](x),
                                          use_running_average=not train)
        return nn.relu(out + identity)


class ResNet18(nn.Module):
    """torchvision resnet18 graph: conv7x7/2 -> maxpool3/2 -> 4 stages of 2
    BasicBlocks (64/128/256/512) -> global avgpool -> fc. Stage attribute
    names `layer1..layer4` mirror torchvision state_dict names."""
    num_classes: int = N_KEYS
    in_features: int = 64
    dtype: str | None = None

    def setup(self):
        self.conv1 = nn.Conv(64, (7, 7), strides=(2, 2),
                             padding=[(3, 3), (3, 3)], use_bias=False,
                             kernel_init=torch_conv_init, dtype=self.dtype)
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)

        def stage(feats, stride, downsample):
            return [BasicBlock(feats, stride, use_downsample=downsample,
                               dtype=self.dtype),
                    BasicBlock(feats, 1, dtype=self.dtype)]

        self.layer1 = stage(64, 1, False)
        self.layer2 = stage(128, 2, True)
        self.layer3 = stage(256, 2, True)
        self.layer4 = stage(512, 2, True)
        self.fc = nn.Dense(self.num_classes, kernel_init=torch_conv_init)

    def __call__(self, x, train: bool):
        x = nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for stage in (self.layer1, self.layer2, self.layer3, self.layer4):
            for block in stage:
                x = block(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return self.fc(x)


class PrestackModule(nn.Module):
    """U-Net prestack (stride-1 downsampling convs,
    `model/Unet_prestack.py:98-109`) -> ResNet-18 over each 229x25 patch."""
    n_bins: int = C.N_BINS
    patch: int = 25
    dtype: str | None = None

    def setup(self):
        self.Unet1_encoder = Encoder(ds_ksize=(3, 3), ds_stride=(1, 1),
                                     dtype=self.dtype)
        self.Unet1_decoder = Decoder(num_instruments=1, ds_ksize=(3, 3),
                                     ds_stride=(1, 1), dtype=self.dtype)
        self.resnet = ResNet18(N_KEYS, dtype=self.dtype)

    def __call__(self, spec, train: bool = False):
        """spec (B, T, F) -> logits (B, T, 88) (sigmoid applied by caller,
        matching `model/Unet_prestack.py:158`)."""
        B, T, F = spec.shape
        pad = self.patch // 2
        padded = jnp.pad(spec, ((0, 0), (pad, pad), (0, 0)))
        # per-frame patches: (B, T, F, patch) -> flatten into the batch.
        import numpy as np

        idx = np.arange(T)[:, None] + np.arange(self.patch)[None, :]
        patches = padded[:, idx]                 # (B, T, patch, F)
        # reference patches are (freq, time) images
        patches = jnp.swapaxes(patches, 2, 3)    # (B, T, F, patch)
        x = patches.reshape(B * T, F, self.patch, 1)
        z, s, c = self.Unet1_encoder(x, train)
        x = self.Unet1_decoder(z, s, c, train)   # (B*T, F, patch, 1)
        logits = self.resnet(x, train)           # (B*T, 88)
        return logits.reshape(B, T, N_KEYS)


@dataclasses.dataclass
class Prestack:
    """Batch contract (`model/Unet_prestack.py:129-176`): supervised only;
    loss key 'loss/train_frame' in train and eval like the reference."""
    log: bool = True
    mode: str = "imagewise"
    spec: str = "Mel"
    n_heads: int = 4
    reconstruction: bool = False
    compute_dtype: str | None = None  # 'bfloat16' = mixed-precision compute

    def __post_init__(self):
        self.frontend, self.n_bins = make_frontend(
            self.spec,
            precision=frontend_precision(self.compute_dtype))
        self.module = PrestackModule(self.n_bins,
                                     dtype=self.compute_dtype)
        self.normalize = Normalization(self.mode)

    def init(self, key, seq_frames: int = 640):
        dummy = jnp.zeros((1, min(seq_frames, 8), self.n_bins))
        return self.module.init(key, dummy, train=False)

    def make_spec(self, audio, t_true=None):
        from .common import make_log_norm_spec

        return make_log_norm_spec(self, audio, t_true)

    def run_on_batch(self, variables, batch_l, batch_ul=None, key=None,
                     vat: bool = False, train: bool = True, t_true=None):
        from .common import frame_mask

        frame_label = batch_l["frame"]
        mask = (None if t_true is None
                else frame_mask(t_true, frame_label.shape[1]))
        spec = self.make_spec(batch_l["audio"], t_true)
        if train:
            logits, updates = self.module.apply(variables, spec, train=True,
                                                mutable=["batch_stats"])
            new_stats = updates.get("batch_stats")
        else:
            logits = self.module.apply(variables, spec, train=False)
            new_stats = None
        frame_pred = nn.sigmoid(logits)
        predictions = {"onset": frame_pred, "frame": frame_pred,
                       "r_adv": None}
        losses = {"loss/train_frame":
                  binary_cross_entropy(frame_pred, frame_label, mask)}
        return predictions, losses, spec, new_stats

    def transcribe(self, variables, audio, bucket_frames: int = 0):
        from .common import transcribe_spec

        spec, t_true = transcribe_spec(self, audio, bucket_frames)
        frame_pred = nn.sigmoid(self.module.apply(variables, spec,
                                                  train=False))
        if bucket_frames:
            frame_pred = frame_pred[:, :t_true]
        return {"onset": frame_pred, "frame": frame_pred}

    def load_reference_weights(self, path: str, variables):
        """Load a reference `Prestack_Model` torch state_dict.

        Key map (`model/Unet_prestack.py:113-124`): the reference wraps
        `nn.Sequential(unet, resnet)` as `prestack_model`, so U-Net keys
        carry a `prestack_model.0.` prefix and torchvision-resnet keys a
        `prestack_model.1.` prefix; remaining numeric path components are
        torch Sequential indices, which flax writes as `name_i`.
        """
        import re

        from ..train.torch_convert import load_torch_checkpoint, torch_to_flax

        sd = load_torch_checkpoint(path)
        renamed = {}
        for k, v in sd.items():
            if k.startswith("prestack_model.0."):
                k = k[len("prestack_model.0."):]
            elif k.startswith("prestack_model.1."):
                k = "resnet." + k[len("prestack_model.1."):]
            renamed[re.sub(r"\.(\d+)\.", r"_\1.", k)] = v
        converted, report = torch_to_flax(renamed, variables)
        residual = [k for k in report["skipped"]
                    if not k.startswith(("spectrogram.", "normalize."))]
        if residual:
            raise ValueError(f"unconverted model weights: {residual}")
        return converted
