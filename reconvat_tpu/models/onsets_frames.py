"""Onsets-and-Frames baseline family (CNN + BiLSTM), with VAT.

Port targets (reference `model/onset_frame_VAT.py`):
  * `OnsetsAndFrames_VAT_full` (:603-719) — onset stack + frame stack +
    combined stack over cat[stop_grad(onset), activation];
  * `Frame_stack_VAT` (:417-514) — frame stack + combined stack;
  * `Onset_stack_VAT` (:516-600) — onset stack only.
VAT attacks the frame (or onset) output with the 1e10 rescue
(`model/onset_frame_VAT.py:175-207`).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import constants as C
from ..nn.layers import CombineStack, ConvStack, OnsetStack
from ..nn.unet import torch_conv_init
from ..ops.normalize import Normalization
from ..ops.spectrogram import frontend_precision, make_frontend
from ..vat import VATConfig, vat_loss
from .losses import binary_cross_entropy

N_KEYS = C.N_KEYS


class OnsetsAndFramesModule(nn.Module):
    """Reference `OnsetsAndFrames_VAT_full` forward
    (`model/onset_frame_VAT.py:627-635`)."""
    input_features: int = C.N_BINS
    output_features: int = N_KEYS
    model_complexity: int = 48
    dtype: str | None = None   # conv-trunk compute dtype (bf16 mixed prec)

    def setup(self):
        model_size = self.model_complexity * 16
        self.onset_stack = OnsetStack(self.input_features, model_size,
                                      self.output_features,
                                      dtype=self.dtype)
        self.combined_stack = CombineStack(model_size, self.output_features)
        self.frame_conv = ConvStack(self.input_features, model_size,
                                    dtype=self.dtype)
        self.frame_linear = nn.Dense(self.output_features,
                                     kernel_init=torch_conv_init)

    def __call__(self, spec, train: bool = False):
        """spec (B, T, F) -> (onset, activation, frame), each (B, T, 88)."""
        onset_pred = self.onset_stack(spec, train)
        activation_pred = nn.sigmoid(
            self.frame_linear(self.frame_conv(spec, train)))
        combined = jnp.concatenate(
            [jax.lax.stop_gradient(onset_pred), activation_pred], axis=-1)
        frame_pred = self.combined_stack(combined, train)
        return onset_pred, activation_pred, frame_pred

    def frame_only(self, spec, train: bool = False):
        """VAT target (frame BCE only, `model/onset_frame_VAT.py:186-188`)."""
        return self(spec, train)[2]


@dataclasses.dataclass
class OnsetsAndFrames:
    """Batch contract mirroring `OnsetsAndFrames_VAT_full.run_on_batch`
    (`model/onset_frame_VAT.py:637-706`)."""
    input_features: int = C.N_BINS
    output_features: int = N_KEYS
    model_complexity: int = 48
    log: bool = True
    mode: str = "imagewise"
    spec: str = "Mel"
    xi: float = 1e-5
    eps: float = 10.0
    kl_div: bool = False
    n_heads: int = 4
    reconstruction: bool = False   # this family has no reconstruction chain
    compute_dtype: str | None = None  # 'bfloat16' = mixed-precision trunk

    def __post_init__(self):
        self.frontend, self.n_bins = make_frontend(
            self.spec,
            precision=frontend_precision(self.compute_dtype))
        self.module = OnsetsAndFramesModule(self.n_bins,
                                            self.output_features,
                                            self.model_complexity,
                                            dtype=self.compute_dtype)
        self.normalize = Normalization(self.mode)
        # spec here is (B, T, F): VAT L2 norm over the bins axis = -1
        self.vat_cfg = VATConfig(xi=self.xi, eps=self.eps, n_power=1,
                                 kl_div=self.kl_div, norm_axis=-1)

    def init(self, key, seq_frames: int = 640):
        dummy = jnp.zeros((1, seq_frames, self.n_bins))
        return self.module.init({"params": key}, dummy, train=False)

    def make_spec(self, audio, t_true=None):
        # Mesh note: this family is data-parallel only (mesh_sp=1). The
        # BiLSTM stacks scan over time, so sequence-parallel time sharding
        # would turn the recurrence into a per-step collective chain
        # (SURVEY §2.5); spec_constraint still applies the dp batch
        # sharding, and sp=1 meshes leave the time axis whole.
        from ..parallel.mesh import spec_constraint

        from .common import make_log_norm_spec

        return spec_constraint(make_log_norm_spec(self, audio, t_true))

    def _apply(self, variables, x, train, rngs=None):
        if train:
            out, updates = self.module.apply(variables, x, train=True,
                                             mutable=["batch_stats"],
                                             rngs=rngs)
            return out, updates.get("batch_stats")
        return self.module.apply(variables, x, train=False), None

    def _frame_fn(self, variables, train, rngs=None):
        def fn(x):
            if train:
                out, _ = self.module.apply(
                    variables, x, train=True, mutable=["batch_stats"],
                    rngs=rngs, method=OnsetsAndFramesModule.frame_only)
                return out
            return self.module.apply(variables, x, train=False,
                                     method=OnsetsAndFramesModule.frame_only)
        return fn

    def run_on_batch(self, variables, batch_l, batch_ul=None, key=None,
                     vat: bool = False, train: bool = True, t_true=None):
        from .common import frame_mask

        prefix = "train" if train else "test"
        frame_label = batch_l["frame"]
        onset_label = batch_l["onset"]
        mask = (None if t_true is None
                else frame_mask(t_true, frame_label.shape[1]))
        zero = jnp.zeros(())

        key = key if key is not None else jax.random.PRNGKey(0)
        key, drop_key = jax.random.split(key)
        rngs = {"dropout": drop_key} if train else None

        lds_ul, r_norm_ul = zero, zero
        if batch_ul is not None:
            spec_ul = self.make_spec(batch_ul["audio"])
            k_ul, key = jax.random.split(key)
            lds_ul, _, rn = vat_loss(self._frame_fn(variables, train, rngs),
                                     spec_ul, k_ul, self.vat_cfg)
            r_norm_ul = jnp.mean(jnp.abs(rn))

        spec = self.make_spec(batch_l["audio"], t_true)

        lds_l, r_adv, r_norm_l = zero, None, zero
        if vat:
            k_l, key = jax.random.split(key)
            lds_l, r_adv, rn = vat_loss(self._frame_fn(variables, train,
                                                       rngs),
                                        spec, k_l, self.vat_cfg)
            r_norm_l = jnp.mean(jnp.abs(rn))

        out, new_stats = self._apply(variables, spec, train, rngs)
        onset_pred, activation_pred, frame_pred = out

        predictions = {"onset": onset_pred, "frame": frame_pred,
                       "activation": activation_pred, "r_adv": r_adv}
        losses = {
            f"loss/{prefix}_frame":
                binary_cross_entropy(frame_pred, frame_label, mask),
            f"loss/{prefix}_onset":
                binary_cross_entropy(onset_pred, onset_label, mask),
            f"loss/{prefix}_LDS_l": lds_l,
        }
        if train:
            losses[f"loss/{prefix}_LDS_ul"] = lds_ul
            losses[f"loss/{prefix}_r_norm_l"] = r_norm_l
            losses[f"loss/{prefix}_r_norm_ul"] = r_norm_ul
        else:
            losses[f"loss/{prefix}_r_norm_l"] = r_norm_l

        return predictions, losses, spec, new_stats

    def transcribe(self, variables, audio, bucket_frames: int = 0):
        from .common import transcribe_spec

        spec, t_true = transcribe_spec(self, audio, bucket_frames)
        onset_pred, _, frame_pred = self.module.apply(variables, spec,
                                                      train=False)
        if bucket_frames:
            onset_pred = onset_pred[:, :t_true]
            frame_pred = frame_pred[:, :t_true]
        return {"onset": onset_pred, "frame": frame_pred}

    def load_reference_weights(self, path: str, variables):
        return _load_of_weights(self, path, variables)


def _load_of_weights(self, path, variables):
    from ..train.torch_convert import load_torch_checkpoint, torch_to_flax
    from ..nn.layers import lstm_torch_entries
    import numpy as np

    sd = dict(load_torch_checkpoint(path))
    renamed = {}
    for k, v in sd.items():
        k2 = (k
              .replace(".convstack.cnn.0.", ".convstack.conv0.")
              .replace(".convstack.cnn.1.", ".convstack.bn0.")
              .replace(".convstack.cnn.3.", ".convstack.conv1.")
              .replace(".convstack.cnn.4.", ".convstack.bn1.")
              .replace(".convstack.cnn.8.", ".convstack.conv2.")
              .replace(".convstack.cnn.9.", ".convstack.bn2.")
              .replace(".convstack.fc.0.", ".convstack.fc.")
              .replace("frame_stack.0.cnn.0.", "frame_conv.conv0.")
              .replace("frame_stack.0.cnn.1.", "frame_conv.bn0.")
              .replace("frame_stack.0.cnn.3.", "frame_conv.conv1.")
              .replace("frame_stack.0.cnn.4.", "frame_conv.bn1.")
              .replace("frame_stack.0.cnn.8.", "frame_conv.conv2.")
              .replace("frame_stack.0.cnn.9.", "frame_conv.bn2.")
              .replace("frame_stack.0.fc.0.", "frame_conv.fc.")
              .replace("frame_stack.1.", "frame_linear."))
        renamed[k2] = v
    converted, report = torch_to_flax(renamed, variables)
    # LSTMs need the gate-splitting converter
    params = converted["params"]
    for torch_prefix, flax_path in [
            ("onset_stack.sequence_model", ("onset_stack",
                                            "sequence_model")),
            ("combined_stack.sequence_model", ("combined_stack",
                                               "sequence_model"))]:
        if flax_path[0] not in params:
            continue
        entries = lstm_torch_entries(torch_prefix, "x", renamed)
        for key_str, val in entries.items():
            parts = key_str.split("/")[1:]  # drop the placeholder root
            node = params
            for p in flax_path + tuple(parts[:-1]):
                node = node[p]
            assert node[parts[-1]].shape == val.shape
            node[parts[-1]] = val.astype(np.float32)
    return converted


class FrameStackModule(nn.Module):
    """Reference `Frame_stack_VAT` forward (`model/onset_frame_VAT.py:
    445-451`): frame stack -> combined stack, no onset branch."""
    input_features: int = C.N_BINS
    output_features: int = N_KEYS
    model_complexity: int = 48
    dtype: str | None = None

    def setup(self):
        model_size = self.model_complexity * 16
        self.combined_stack = CombineStack(model_size, self.output_features)
        self.frame_conv = ConvStack(self.input_features, model_size,
                                    dtype=self.dtype)
        self.frame_linear = nn.Dense(self.output_features,
                                     kernel_init=torch_conv_init)

    def __call__(self, spec, train: bool = False):
        activation_pred = nn.sigmoid(
            self.frame_linear(self.frame_conv(spec, train)))
        frame_pred = self.combined_stack(activation_pred, train)
        return activation_pred, frame_pred

    def both(self, spec, train: bool = False):
        act, frame = self(spec, train)
        return {"activation": act, "frame": frame}


class OnsetStackModule(nn.Module):
    """Reference `Onset_stack_VAT` forward (`model/onset_frame_VAT.py:
    534-537`)."""
    input_features: int = C.N_BINS
    output_features: int = N_KEYS
    model_complexity: int = 48
    dtype: str | None = None

    def setup(self):
        model_size = self.model_complexity * 16
        self.onset_stack = OnsetStack(self.input_features, model_size,
                                      self.output_features,
                                      dtype=self.dtype)

    def __call__(self, spec, train: bool = False):
        return self.onset_stack(spec, train)


@dataclasses.dataclass
class FrameStackVAT(OnsetsAndFrames):
    """Frame-stack ablation; VAT_mode selects activation-MSE / frame-BCE /
    both, 1e20 rescue (reference `stepwise_VAT_frame_stack`,
    `model/onset_frame_VAT.py:209-269`)."""
    vat_mode: str = "all"

    def __post_init__(self):
        from .losses import mse_loss

        self.frontend, self.n_bins = make_frontend(
            self.spec,
            precision=frontend_precision(self.compute_dtype))
        self.module = FrameStackModule(self.n_bins, self.output_features,
                                       self.model_complexity,
                                       dtype=self.compute_dtype)
        self.normalize = Normalization(self.mode)

        mode = self.vat_mode

        def objective(y_pred, y_ref):
            act = mse_loss(y_pred["activation"], y_ref["activation"])
            frame = binary_cross_entropy(y_pred["frame"], y_ref["frame"])
            if mode == "activation":
                total = act
            elif mode == "frame":
                total = frame
            else:
                total = act + frame
            return total, total

        self.vat_cfg = VATConfig(xi=self.xi, eps=self.eps, n_power=1,
                                 norm_axis=-1, grad_rescue=1e20,
                                 objective=objective)

    def _frame_fn(self, variables, train, rngs=None):
        def fn(x):
            if train:
                out, _ = self.module.apply(
                    variables, x, train=True, mutable=["batch_stats"],
                    rngs=rngs, method=FrameStackModule.both)
                return out
            return self.module.apply(variables, x, train=False,
                                     method=FrameStackModule.both)
        return fn

    def run_on_batch(self, variables, batch_l, batch_ul=None, key=None,
                     vat: bool = False, train: bool = True, t_true=None):
        """Loss keys per reference (`model/onset_frame_VAT.py:491-501`):
        single combined 'loss/{train,test}_LDS'."""
        from .common import frame_mask

        prefix = "train" if train else "test"
        frame_label = batch_l["frame"]
        mask = (None if t_true is None
                else frame_mask(t_true, frame_label.shape[1]))
        zero = jnp.zeros(())

        key = key if key is not None else jax.random.PRNGKey(0)
        key, drop_key = jax.random.split(key)
        rngs = {"dropout": drop_key} if train else None

        spec = self.make_spec(batch_l["audio"], t_true)

        lds_ul = zero
        if batch_ul is not None and vat:
            spec_ul = self.make_spec(batch_ul["audio"])
            k_ul, key = jax.random.split(key)
            lds_ul, _, _ = vat_loss(self._frame_fn(variables, train, rngs),
                                    spec_ul, k_ul, self.vat_cfg)
        lds_l, r_adv = zero, None
        if vat:
            k_l, key = jax.random.split(key)
            lds_l, r_adv, _ = vat_loss(self._frame_fn(variables, train,
                                                      rngs),
                                       spec, k_l, self.vat_cfg)

        out, new_stats = self._apply(variables, spec, train, rngs)
        activation_pred, frame_pred = out
        predictions = {"onset": frame_pred, "frame": frame_pred,
                       "activation": activation_pred, "r_adv": r_adv}
        if train:
            losses = {
                "loss/train_frame":
                    binary_cross_entropy(frame_pred, frame_label, mask),
                "loss/train_LDS": (lds_ul + lds_l) / 2,
            }
        else:
            losses = {
                "loss/test_frame":
                    binary_cross_entropy(frame_pred, frame_label, mask),
                "loss/test_LDS": lds_l,
            }
        return predictions, losses, spec, new_stats


@dataclasses.dataclass
class OnsetStackVAT(OnsetsAndFrames):
    """Onset-stack ablation (reference `Onset_stack_VAT`,
    `model/onset_frame_VAT.py:516-600`). The reference's VAT variant never
    clamps the perturbed input; preserved here. (Its final asserts reference
    undefined variables — a reference bug, not replicated.)"""
    vat_mode: str = "all"

    def __post_init__(self):
        self.frontend, self.n_bins = make_frontend(
            self.spec,
            precision=frontend_precision(self.compute_dtype))
        self.module = OnsetStackModule(self.n_bins, self.output_features,
                                       self.model_complexity,
                                       dtype=self.compute_dtype)
        self.normalize = Normalization(self.mode)
        self.vat_cfg = VATConfig(xi=self.xi, eps=self.eps, n_power=1,
                                 norm_axis=-1, grad_rescue=1.0, clamp=False)

    def _onset_fn(self, variables, train, rngs=None):
        def fn(x):
            if train:
                out, _ = self.module.apply(variables, x, train=True,
                                           mutable=["batch_stats"],
                                           rngs=rngs)
                return out
            return self.module.apply(variables, x, train=False)
        return fn

    def run_on_batch(self, variables, batch_l, batch_ul=None, key=None,
                     vat: bool = False, train: bool = True, t_true=None):
        from .common import frame_mask

        prefix = "train" if train else "test"
        onset_label = batch_l["onset"]
        mask = (None if t_true is None
                else frame_mask(t_true, onset_label.shape[1]))
        zero = jnp.zeros(())

        key = key if key is not None else jax.random.PRNGKey(0)
        key, drop_key = jax.random.split(key)
        rngs = {"dropout": drop_key} if train else None

        spec = self.make_spec(batch_l["audio"], t_true)
        lds_ul = zero
        if batch_ul is not None and vat:
            spec_ul = self.make_spec(batch_ul["audio"])
            k_ul, key = jax.random.split(key)
            lds_ul, _, _ = vat_loss(self._onset_fn(variables, train, rngs),
                                    spec_ul, k_ul, self.vat_cfg)
        lds_l, r_adv = zero, None
        if vat:
            k_l, key = jax.random.split(key)
            lds_l, r_adv, _ = vat_loss(self._onset_fn(variables, train,
                                                      rngs),
                                       spec, k_l, self.vat_cfg)

        out, new_stats = self._apply(variables, spec, train, rngs)
        onset_pred = out
        from .losses import _masked_mean

        accuracy = _masked_mean(
            (onset_label == (onset_pred > 0.5).astype(onset_label.dtype))
            .astype(jnp.float32), mask)
        predictions = {"onset": onset_pred, "frame": onset_pred,
                       "r_adv": r_adv}
        if train:
            losses = {
                "loss/train_onset":
                    binary_cross_entropy(onset_pred, onset_label, mask),
                "metric/train_accuracy": accuracy,
                "loss/train_LDS": (lds_ul + lds_l) / 2,
            }
        else:
            losses = {
                "loss/test_onset":
                    binary_cross_entropy(onset_pred, onset_label, mask),
                "metric/test_accuracy": accuracy,
                "loss/test_LDS": lds_l,
            }
        return predictions, losses, spec, new_stats
