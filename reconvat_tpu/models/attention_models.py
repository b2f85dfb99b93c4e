"""Secondary attention-based models (library models; no shipped CLI config
reaches them — reference SURVEY §2.2).

Port targets:
  * `VAT_self_attention_1D`   (`model/self_attention_VAT.py:257-396`)
  * `VAT_CNN_attention_1D`    (`model/self_attention_VAT.py:518-671`)
  * `VAT_CNN_attention_onset_frame` (`model/self_attention_VAT.py:673-838`)
  * `Timbral_CNN`             (`model/self_attention_VAT.py:447-514`)
  * `OnsetsAndFrames_self_attention` (`model/self_attenttion_model.py:235-366`)
  * `simple_onset_frame`      (`model/self_attenttion_model.py:368-486`)
  * `standalone_self_attention_1D/_2D` (`model/self_attenttion_model.py:
    488-596,598-698`)
  * `Reconstructor`           (`model/self_attention_VAT.py:971-1011`)

The reference's triangular eps schedules mutate module state per step
(`create_triangular_cycle`, `model/self_attention_VAT.py:15-20`); here the
schedule is a host-side generator and `run_on_batch(..., eps=...)` accepts
the scheduled value as a traced argument.
"""
from __future__ import annotations

import dataclasses
import itertools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..nn.attention import MultiHeadAttention1D
from ..nn.layers import ConvStack
from ..nn.unet import torch_conv_init
from ..ops.normalize import Normalization
from ..ops.spectrogram import make_frontend
from ..vat import VATConfig, vat_loss
from .losses import binary_cross_entropy
from .reconvat import Roll2Spec
from .segmentation import MultiHeadAttention2D

N_KEYS = C.N_KEYS


def create_triangular_cycle(start, end, period):
    """Host-side triangular eps schedule (reference
    `model/self_attention_VAT.py:15-20`)."""
    tri_a = np.linspace(start, end, period)
    tri_b = np.linspace(end, start, period)[1:-1]
    return itertools.cycle(np.concatenate([tri_a, tri_b]))


def _ln():
    return nn.LayerNorm(epsilon=1e-5)  # torch LayerNorm default eps


class TimbralCNN(nn.Module):
    """Reference `Timbral_CNN` ('new' branch,
    `model/self_attention_VAT.py:472-489`): 3x3 convs + two (1,2) pools."""
    start_channel: int
    final_channel: int
    output_features: int

    def setup(self):
        p = [(1, 1), (1, 1)]
        self.conv0 = nn.Conv(self.start_channel, (3, 3), padding=p,
                             kernel_init=torch_conv_init)
        self.bn0 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.conv1 = nn.Conv(self.start_channel, (3, 3), padding=p,
                             kernel_init=torch_conv_init)
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.conv2 = nn.Conv(self.final_channel, (3, 3), padding=p,
                             kernel_init=torch_conv_init)
        self.bn2 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.fc = nn.Dense(self.output_features, kernel_init=torch_conv_init)

    def __call__(self, spec, train: bool = False):
        x = spec[..., None]
        x = nn.relu(self.bn0(self.conv0(x), use_running_average=not train))
        x = nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        x = nn.max_pool(x, (1, 2), strides=(1, 2))
        x = nn.relu(self.bn2(self.conv2(x), use_running_average=not train))
        x = nn.max_pool(x, (1, 2), strides=(1, 2))
        B, T, F, Ch = x.shape
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(B, T, Ch * F)
        return self.fc(x)


def _attn_head_setup(mod, model_complexity, output_features, w_size,
                     n_heads, position=True):
    """Define the attention->LN->linear head with the reference's FLAT
    attribute names (`sequence_model`/`layer_norm`/`linear`,
    `model/self_attention_VAT.py:269-276`) so released state_dicts
    convert mechanically — a nested submodule would prefix the names."""
    mod.sequence_model = MultiHeadAttention1D(
        out_features=model_complexity, kernel_size=w_size,
        groups=n_heads, position=position)
    mod.layer_norm = _ln()
    mod.linear = nn.Dense(output_features, kernel_init=torch_conv_init)


def _attn_head_apply(mod, x):
    x, a = mod.sequence_model(x)
    x = mod.layer_norm(x)
    return nn.sigmoid(mod.linear(x)), a


@dataclasses.dataclass
class _AttnModelBase:
    """Shared spec pipeline + VAT plumbing for the 1-output models."""
    input_features: int = C.N_BINS
    output_features: int = N_KEYS
    model_complexity: int = 48
    w_size: int = 31
    log: bool = True
    mode: str = "imagewise"
    spec: str = "Mel"
    n_heads: int = 8
    position: bool = True
    xi: float = 1e-5
    eps: float = 1e-2
    kl_div: bool = False
    eps_period: int = 0
    eps_max: float = 1.0
    reconstruction: bool = False

    def _common_init(self):
        self.frontend, self.n_bins = make_frontend(self.spec)
        self.normalize = Normalization(self.mode)
        self.vat_cfg = VATConfig(xi=self.xi, eps=self.eps, n_power=1,
                                 kl_div=self.kl_div, norm_axis=-1,
                                 grad_rescue=1.0)
        self.triangular_cycle = (
            create_triangular_cycle(self.eps, self.eps_max, self.eps_period)
            if self.eps_period else None)

    def init(self, key, seq_frames: int = 640):
        dummy = jnp.zeros((1, seq_frames, self.n_bins))
        return self.module.init({"params": key}, dummy, train=False)

    def make_spec(self, audio):
        spec = self.frontend(audio[:, :-1])
        if self.log:
            spec = jnp.log(spec + 1e-5)
        return self.normalize(spec)

    def _apply(self, variables, x, train, rngs=None):
        if train:
            out, updates = self.module.apply(variables, x, train=True,
                                             mutable=["batch_stats"],
                                             rngs=rngs)
            return out, updates.get("batch_stats")
        return self.module.apply(variables, x, train=False), None

    def _frame_fn(self, variables, train, rngs=None):
        def fn(x):
            out, _ = self._apply(variables, x, train, rngs)
            return out[0]
        return fn

    def run_on_batch(self, variables, batch_l, batch_ul=None, key=None,
                     vat: bool = False, train: bool = True, eps=None):
        prefix = "train" if train else "test"
        frame_label = batch_l["frame"]
        zero = jnp.zeros(())
        cfg = self.vat_cfg if eps is None else dataclasses.replace(
            self.vat_cfg, eps=eps)

        key = key if key is not None else jax.random.PRNGKey(0)
        key, drop_key = jax.random.split(key)
        rngs = {"dropout": drop_key} if train else None

        lds_ul, r_norm_ul = zero, zero
        if batch_ul is not None:
            spec_ul = self.make_spec(batch_ul["audio"])
            k_ul, key = jax.random.split(key)
            lds_ul, _, rn = vat_loss(self._frame_fn(variables, train, rngs),
                                     spec_ul, k_ul, cfg)
            r_norm_ul = jnp.mean(jnp.abs(rn))

        spec = self.make_spec(batch_l["audio"])
        lds_l, r_adv, r_norm_l = zero, None, zero
        if vat:
            k_l, key = jax.random.split(key)
            lds_l, r_adv, rn = vat_loss(self._frame_fn(variables, train,
                                                       rngs),
                                        spec, k_l, cfg)
            r_norm_l = jnp.mean(jnp.abs(rn))

        out, new_stats = self._apply(variables, spec, train, rngs)
        frame_pred, a = out[0], out[-1]

        predictions = {"onset": frame_pred, "frame": frame_pred,
                       "attention": a, "r_adv": r_adv}
        losses = {
            f"loss/{prefix}_frame":
                binary_cross_entropy(frame_pred, frame_label),
            f"loss/{prefix}_LDS_l": lds_l,
        }
        if train:
            losses[f"loss/{prefix}_LDS_ul"] = lds_ul
            losses[f"loss/{prefix}_r_norm_l"] = r_norm_l
            losses[f"loss/{prefix}_r_norm_ul"] = r_norm_ul
        else:
            losses[f"loss/{prefix}_r_norm_l"] = r_norm_l
        return predictions, losses, spec, new_stats

    def transcribe(self, variables, audio):
        spec = self.make_spec(audio)
        out = self.module.apply(variables, spec, train=False)
        return {"onset": out[0], "frame": out[0]}


class _SA1DModule(nn.Module):
    model_complexity: int
    output_features: int
    w_size: int
    n_heads: int
    position: bool = True

    def setup(self):
        _attn_head_setup(self, self.model_complexity, self.output_features,
                         self.w_size, self.n_heads, self.position)

    def __call__(self, x, train: bool = False):
        return _attn_head_apply(self, x)


@dataclasses.dataclass
class VATSelfAttention1D(_AttnModelBase):
    """Reference `VAT_self_attention_1D`: single attention layer + LN +
    linear, VAT via generic stepwise_VAT (no rescue)."""

    def __post_init__(self):
        self._common_init()
        self.module = _SA1DModule(self.model_complexity,
                                  self.output_features, self.w_size,
                                  self.n_heads, self.position)


class _CNNAttn1DModule(nn.Module):
    input_features: int
    output_features: int
    model_complexity: int
    w_size: int
    n_heads: int
    version: str = "a"

    def setup(self):
        if self.version == "a":
            self.cnn = ConvStack(self.input_features, self.output_features)
        else:
            self.cnn = TimbralCNN(32, 8, self.output_features)
        _attn_head_setup(self, self.model_complexity,
                         self.output_features, self.w_size, self.n_heads)

    def __call__(self, x, train: bool = False):
        x = self.cnn(x, train)
        return _attn_head_apply(self, x)


@dataclasses.dataclass
class VATCNNAttention1D(_AttnModelBase):
    """Reference `VAT_CNN_attention_1D`: ConvStack/Timbral_CNN trunk +
    attention head; the reference hard-wires a (1e-2, 10, 50) triangular
    eps cycle."""
    version: str = "a"

    def __post_init__(self):
        self._common_init()
        self.triangular_cycle = create_triangular_cycle(1e-2, 10, 50)
        self.module = _CNNAttn1DModule(self.input_features,
                                       self.output_features,
                                       self.model_complexity, self.w_size,
                                       self.n_heads, self.version)


class _CNNAttnOnsetFrameModule(nn.Module):
    input_features: int
    output_features: int
    model_complexity: int
    w_size: int
    n_heads: int

    def setup(self):
        self.cnn = TimbralCNN(48, 96, self.output_features)
        self.onset_timbral_cnn = TimbralCNN(48, 96, self.output_features)
        self.onset_attention = MultiHeadAttention1D(
            out_features=self.model_complexity, kernel_size=self.w_size,
            groups=self.n_heads)
        self.layer_norm_onset = _ln()
        self.onset_classifier = nn.Dense(self.output_features,
                                         kernel_init=torch_conv_init)
        self.final_attention = MultiHeadAttention1D(
            out_features=self.model_complexity, kernel_size=self.w_size,
            groups=self.n_heads)
        self.layer_norm_final = _ln()
        self.final_classifier = nn.Dense(self.output_features,
                                         kernel_init=torch_conv_init)

    def __call__(self, x, train: bool = False):
        onset = self.onset_timbral_cnn(x, train)
        onset, _ = self.onset_attention(onset)
        onset = self.layer_norm_onset(onset)
        onset = nn.sigmoid(self.onset_classifier(onset))
        activation = self.cnn(x, train)
        h, a = self.final_attention(
            jnp.concatenate([onset, activation], axis=-1))
        h = self.layer_norm_final(h)
        frame = nn.sigmoid(self.final_classifier(h))
        return frame, onset, a


@dataclasses.dataclass
class VATCNNAttentionOnsetFrame(_AttnModelBase):
    """Reference `VAT_CNN_attention_onset_frame`: two Timbral_CNNs, onset &
    final attention stacks; VAT attacks the frame output
    (`onset_frame_VAT` variant, `model/self_attention_VAT.py:204-238`)."""

    def __post_init__(self):
        self._common_init()
        self.module = _CNNAttnOnsetFrameModule(
            self.input_features, self.output_features,
            self.model_complexity, self.w_size, self.n_heads)

    def run_on_batch(self, variables, batch_l, batch_ul=None, key=None,
                     vat: bool = False, train: bool = True, eps=None):
        prefix = "train" if train else "test"
        zero = jnp.zeros(())
        cfg = self.vat_cfg if eps is None else dataclasses.replace(
            self.vat_cfg, eps=eps)
        key = key if key is not None else jax.random.PRNGKey(0)
        key, drop_key = jax.random.split(key)
        rngs = {"dropout": drop_key} if train else None

        lds_ul = zero
        if batch_ul is not None:
            spec_ul = self.make_spec(batch_ul["audio"])
            k_ul, key = jax.random.split(key)
            lds_ul, _, _ = vat_loss(self._frame_fn(variables, train, rngs),
                                    spec_ul, k_ul, cfg)
        spec = self.make_spec(batch_l["audio"])
        lds_l, r_adv = zero, None
        if vat:
            k_l, key = jax.random.split(key)
            lds_l, r_adv, _ = vat_loss(self._frame_fn(variables, train,
                                                      rngs),
                                       spec, k_l, cfg)

        out, new_stats = self._apply(variables, spec, train, rngs)
        frame_pred, onset_pred, a = out
        predictions = {"onset": onset_pred, "frame": frame_pred,
                       "attention": a, "r_adv": r_adv}
        losses = {
            f"loss/{prefix}_frame": binary_cross_entropy(frame_pred,
                                                         batch_l["frame"]),
            f"loss/{prefix}_onset": binary_cross_entropy(onset_pred,
                                                         batch_l["onset"]),
            f"loss/{prefix}_LDS_l": lds_l,
        }
        if train:
            losses[f"loss/{prefix}_LDS_ul"] = lds_ul
        return predictions, losses, spec, new_stats


class _OFSelfAttnModule(nn.Module):
    """Reference `OnsetsAndFrames_self_attention` forward
    (`model/self_attenttion_model.py:271-282`)."""
    input_features: int
    output_features: int
    model_complexity: int = 48
    # reference contract: attention kernel == w_size, which must be odd;
    # the reference's own default (30, `model/self_attenttion_model.py:
    # 238`) trips its odd-kernel assert — reference bug, default here is
    # the usable 31
    w_size: int = 31
    n_heads: int = 8

    def setup(self):
        model_size = self.model_complexity * 16
        self.onset_conv = ConvStack(self.input_features, model_size)
        self.onset_attn = MultiHeadAttention1D(out_features=model_size,
                                               kernel_size=self.w_size,
                                               groups=self.n_heads)
        self.onset_linear = nn.Dense(self.output_features,
                                     kernel_init=torch_conv_init)
        self.frame_conv = ConvStack(self.input_features, model_size)
        self.frame_linear = nn.Dense(self.output_features,
                                     kernel_init=torch_conv_init)
        self.combined_attn = MultiHeadAttention1D(out_features=model_size,
                                                  kernel_size=self.w_size,
                                                  groups=self.n_heads)
        self.combined_linear = nn.Dense(self.output_features,
                                        kernel_init=torch_conv_init)

    def __call__(self, spec, train: bool = False):
        x = self.onset_conv(spec, train)
        x, _ = self.onset_attn(x)
        onset_pred = nn.sigmoid(self.onset_linear(x))
        activation_pred = nn.sigmoid(
            self.frame_linear(self.frame_conv(spec, train)))
        combined = jnp.concatenate(
            [jax.lax.stop_gradient(onset_pred), activation_pred], axis=-1)
        h, a = self.combined_attn(combined)
        frame_pred = nn.sigmoid(self.combined_linear(h))
        return onset_pred, activation_pred, frame_pred, a


@dataclasses.dataclass
class OnsetsAndFramesSelfAttention:
    """Reference `OnsetsAndFrames_self_attention` batch contract
    (`model/self_attenttion_model.py:286-331`): supervised, plain
    'loss/onset' + 'loss/frame' keys."""
    input_features: int = C.N_BINS
    output_features: int = N_KEYS
    model_complexity: int = 48
    w_size: int = 31   # attention kernel (odd; see _OFSelfAttnModule)
    n_heads: int = 8
    log: bool = True
    mode: str = "imagewise"
    spec: str = "Mel"
    onset_stack: bool = True
    reconstruction: bool = False

    def __post_init__(self):
        self.frontend, self.n_bins = make_frontend(self.spec)
        self.normalize = Normalization(self.mode)
        self.module = _OFSelfAttnModule(self.n_bins, self.output_features,
                                        self.model_complexity, self.w_size,
                                        self.n_heads)

    def init(self, key, seq_frames: int = 640):
        dummy = jnp.zeros((1, seq_frames, self.n_bins))
        return self.module.init({"params": key}, dummy, train=False)

    def make_spec(self, audio):
        spec = self.frontend(audio[:, :-1])
        if self.log:
            spec = jnp.log(spec + 1e-5)
        return self.normalize(spec)

    def run_on_batch(self, variables, batch_l, batch_ul=None, key=None,
                     vat: bool = False, train: bool = True):
        key = key if key is not None else jax.random.PRNGKey(0)
        rngs = {"dropout": key} if train else None
        spec = self.make_spec(batch_l["audio"])
        if train:
            out, updates = self.module.apply(variables, spec, train=True,
                                             mutable=["batch_stats"],
                                             rngs=rngs)
            new_stats = updates.get("batch_stats")
        else:
            out = self.module.apply(variables, spec, train=False)
            new_stats = None
        onset_pred, activation_pred, frame_pred, a = out
        if self.onset_stack:
            predictions = {"onset": onset_pred,
                           "activation": activation_pred,
                           "frame": frame_pred, "attention": a,
                           "r_adv": None}
            losses = {
                "loss/onset": binary_cross_entropy(onset_pred,
                                                   batch_l["onset"]),
                "loss/frame": binary_cross_entropy(frame_pred,
                                                   batch_l["frame"]),
            }
        else:
            predictions = {"onset": frame_pred,
                           "activation": activation_pred,
                           "frame": frame_pred, "attention": a,
                           "r_adv": None}
            losses = {"loss/frame": binary_cross_entropy(
                frame_pred, batch_l["frame"])}
        return predictions, losses, spec, new_stats

    def transcribe(self, variables, audio):
        spec = self.make_spec(audio)
        onset_pred, _, frame_pred, _ = self.module.apply(variables, spec,
                                                         train=False)
        return {"onset": onset_pred, "frame": frame_pred}


class _SimpleOnsetFrameModule(nn.Module):
    """Reference `simple_onset_frame` forward
    (`model/self_attenttion_model.py:402-414`)."""
    input_features: int
    output_features: int
    model_complexity: int = 48
    w_size: int = 31
    n_heads: int = 8
    position: bool = True

    def setup(self):
        self.sequence_model_onset = MultiHeadAttention1D(
            out_features=self.model_complexity, kernel_size=self.w_size,
            groups=self.n_heads, position=self.position)
        self.layer_norm_onset = _ln()
        self.linear_onset = nn.Dense(self.output_features,
                                     kernel_init=torch_conv_init)
        self.sequence_model_frame = MultiHeadAttention1D(
            out_features=self.model_complexity, kernel_size=self.w_size,
            groups=self.n_heads, position=self.position)
        self.layer_norm_frame = _ln()
        self.linear_frame = nn.Dense(self.output_features,
                                     kernel_init=torch_conv_init)

    def __call__(self, spec, train: bool = False):
        x, a = self.sequence_model_onset(spec)
        x = self.layer_norm_onset(x)
        onset_pred = nn.sigmoid(self.linear_onset(x))
        h = jnp.concatenate([onset_pred, x], axis=-1)
        h, _ = self.sequence_model_frame(h)
        h = self.layer_norm_frame(h)
        frame_pred = nn.sigmoid(self.linear_frame(h))
        return frame_pred, onset_pred, a


@dataclasses.dataclass
class SimpleOnsetFrame:
    """Reference `simple_onset_frame` batch contract
    (`model/self_attenttion_model.py:418-451`): note the asymmetric keys —
    'loss/onset' always, 'loss/{train,test}_frame' by mode."""
    input_features: int = C.N_BINS
    output_features: int = N_KEYS
    model_complexity: int = 48
    w_size: int = 31
    n_heads: int = 8
    position: bool = True
    log: bool = True
    mode: str = "imagewise"
    spec: str = "Mel"
    reconstruction: bool = False

    def __post_init__(self):
        self.frontend, self.n_bins = make_frontend(self.spec)
        self.normalize = Normalization(self.mode)
        self.module = _SimpleOnsetFrameModule(
            self.n_bins, self.output_features, self.model_complexity,
            self.w_size, self.n_heads, self.position)

    def init(self, key, seq_frames: int = 640):
        dummy = jnp.zeros((1, seq_frames, self.n_bins))
        return self.module.init({"params": key}, dummy, train=False)

    def make_spec(self, audio):
        spec = self.frontend(audio[:, :-1])
        if self.log:
            spec = jnp.log(spec + 1e-5)
        return self.normalize(spec)

    def run_on_batch(self, variables, batch_l, batch_ul=None, key=None,
                     vat: bool = False, train: bool = True):
        spec = self.make_spec(batch_l["audio"])
        frame_pred, onset_pred, a = self.module.apply(variables, spec,
                                                      train=False)
        predictions = {"onset": onset_pred, "frame": frame_pred,
                       "attention": a, "r_adv": None}
        frame_key = "loss/train_frame" if train else "loss/test_frame"
        losses = {
            "loss/onset": binary_cross_entropy(onset_pred,
                                               batch_l["onset"]),
            frame_key: binary_cross_entropy(frame_pred, batch_l["frame"]),
        }
        return predictions, losses, spec, None

    def transcribe(self, variables, audio):
        spec = self.make_spec(audio)
        frame_pred, onset_pred, _ = self.module.apply(variables, spec,
                                                      train=False)
        return {"onset": onset_pred, "frame": frame_pred}


class _Standalone1DModule(nn.Module):
    """Reference `standalone_self_attention_1D` forward
    (`model/self_attenttion_model.py:512-524`)."""
    model_complexity: int
    output_features: int
    w_size: int
    n_heads: int
    position: bool = True
    layernorm_pos: str | None = None

    def setup(self):
        self.sequence_model = MultiHeadAttention1D(
            out_features=self.model_complexity, kernel_size=self.w_size,
            groups=self.n_heads, position=self.position)
        if self.layernorm_pos in ("Before", "After"):
            self.layer_norm = _ln()
        self.linear = nn.Dense(self.output_features,
                               kernel_init=torch_conv_init)

    def __call__(self, spec, train: bool = False):
        x, a = self.sequence_model(spec)
        if self.layernorm_pos == "Before":
            x = self.layer_norm(x)
        x = self.linear(x)
        if self.layernorm_pos == "After":
            x = self.layer_norm(x)
        return nn.sigmoid(x), a


@dataclasses.dataclass
class StandaloneSelfAttention1D(SimpleOnsetFrame):
    """Minimal attention-only frame model."""
    layernorm_pos: str | None = None

    def __post_init__(self):
        self.frontend, self.n_bins = make_frontend(self.spec)
        self.normalize = Normalization(self.mode)
        self.module = _Standalone1DModule(
            self.model_complexity, self.output_features, self.w_size,
            self.n_heads, self.position, self.layernorm_pos)

    def run_on_batch(self, variables, batch_l, batch_ul=None, key=None,
                     vat: bool = False, train: bool = True):
        spec = self.make_spec(batch_l["audio"])
        frame_pred, a = self.module.apply(variables, spec, train=False)
        predictions = {"onset": frame_pred, "frame": frame_pred,
                       "attention": a, "r_adv": None}
        frame_key = "loss/train_frame" if train else "loss/test_frame"
        losses = {frame_key: binary_cross_entropy(frame_pred,
                                                  batch_l["frame"])}
        return predictions, losses, spec, None

    def transcribe(self, variables, audio):
        spec = self.make_spec(audio)
        frame_pred, _ = self.module.apply(variables, spec, train=False)
        return {"onset": frame_pred, "frame": frame_pred}


class _Standalone2DModule(nn.Module):
    """Reference `standalone_self_attention_2D` forward
    (`model/self_attenttion_model.py:620-626`)."""
    n_bins: int
    model_complexity: int
    output_features: int
    w_size: tuple = (3, 3)

    def setup(self):
        self.sequence_model = MultiHeadAttention2D(
            self.model_complexity, tuple(self.w_size), groups=1)
        self.linear = nn.Dense(self.output_features,
                               kernel_init=torch_conv_init)

    def __call__(self, spec, train: bool = False):
        x = spec[..., None]                      # (B, T, F, 1)
        x, a = self.sequence_model(x)            # (B, T, F, C)
        B, T, F, Ch = x.shape
        # reference flattens channel-major: transpose(1,2).flatten(2) on
        # (B, C, T, F) -> (B, T, C*F) (`model/self_attenttion_model.py:
        # 623-624`) — the linear reads (c, f)-ordered features
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(B, T, Ch * F)
        return nn.sigmoid(self.linear(x)), a


@dataclasses.dataclass
class StandaloneSelfAttention2D(StandaloneSelfAttention1D):
    """2D local attention over (time, freq) patches."""
    model_complexity: int = 16
    w_size: tuple = (3, 3)

    def __post_init__(self):
        self.frontend, self.n_bins = make_frontend(self.spec)
        self.normalize = Normalization(self.mode)
        self.module = _Standalone2DModule(self.n_bins,
                                          self.model_complexity,
                                          self.output_features, self.w_size)


@dataclasses.dataclass
class Reconstructor:
    """Standalone Roll2Spec trainer (reference `Reconstructor`,
    `model/self_attention_VAT.py:971-1011`): frame labels -> spectrogram."""
    log: bool = True
    mode: str = "imagewise"
    spec: str = "Mel"
    n_heads: int = 4
    reconstruction: bool = False

    def __post_init__(self):
        self.frontend, self.n_bins = make_frontend(self.spec)
        self.normalize = Normalization("imagewise")
        self.module = Roll2Spec(self.n_bins)

    def init(self, key, seq_frames: int = 640):
        dummy = jnp.zeros((1, seq_frames, N_KEYS))
        return self.module.init(key, dummy, train=False)

    def run_on_batch(self, variables, batch_l, batch_ul=None, key=None,
                     vat: bool = False, train: bool = True):
        prefix = "train"
        spec = self.frontend(batch_l["audio"][:, :-1])
        spec = jnp.log(spec + 1e-5)
        spec = self.normalize(spec)
        if train:
            (reconstruction, a), updates = self.module.apply(
                variables, batch_l["frame"], train=True,
                mutable=["batch_stats"])
            new_stats = updates.get("batch_stats")
        else:
            reconstruction, a = self.module.apply(variables,
                                                  batch_l["frame"],
                                                  train=False)
            new_stats = None
        predictions = {"attention": a, "reconstruction": reconstruction,
                       "r_adv": None}
        # The reference BCEs the *unbounded* decoder output against the
        # normalized spec (`model/self_attention_VAT.py:1008`) — torch's BCE
        # rejects inputs outside [0,1], so that path cannot actually run.
        # We clamp into [0,1] to make the trainer usable.
        rec = jnp.clip(reconstruction[..., 0], 0.0, 1.0)
        losses = {f"loss/{prefix}_reconstruction": binary_cross_entropy(
            rec, jax.lax.stop_gradient(spec))}
        return predictions, losses, spec, new_stats
