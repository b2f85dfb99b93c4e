"""UNet_Onset: ReconVAT skeleton with a 2-channel decoder driving separate
onset and frame heads.

Port target: reference `model/UNet_onset.py:270-553` — decoder channel 0
feeds the onset head, channel 1 a feature head; their concat goes through a
window-31 attention `Stack` (hidden 768, 6 heads) to the frame roll. VAT
penalizes frame BCE + onset BCE (`model/UNet_onset.py:116-162`).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import constants as C
from ..nn.attention import MultiHeadAttention1D
from ..nn.unet import (Decoder, Encoder, torch_conv_init, unet_fold_specs,
                       unfold_channels)
from ..ops.normalize import Normalization
from ..ops.spectrogram import frontend_precision, make_frontend
from ..vat import VATConfig, vat_loss
from .losses import binary_cross_entropy, mse_loss
from .reconvat import Roll2Spec

N_KEYS = C.N_KEYS


class Stack(nn.Module):
    """Reference `Stack` (`model/UNet_onset.py:270-282`)."""
    hidden_dim: int = 768
    attn_size: int = 31
    attn_group: int = 4
    output_dim: int = N_KEYS
    dropout: float = 0.5
    attn_block_size: int = 128
    attn_impl: str = "auto"
    dtype: str | None = None

    def setup(self):
        self.attention = MultiHeadAttention1D(
            out_features=self.hidden_dim, kernel_size=self.attn_size,
            groups=self.attn_group, block_size=self.attn_block_size,
            impl=self.attn_impl, dtype=self.dtype)
        self.linear = nn.Dense(self.output_dim, kernel_init=torch_conv_init)
        self.dropout_layer = nn.Dropout(self.dropout)

    def __call__(self, x, train: bool = False):
        x, a = self.attention(x)
        x = self.linear(x)
        x = self.dropout_layer(x, deterministic=not train
                               or self.dropout == 0.0)
        return x, a


class OnsetSpec2Roll(nn.Module):
    """Reference onset-variant `Spec2Roll` (`model/UNet_onset.py:284-315`)."""
    n_bins: int = C.N_BINS
    attn_block_size: int = 128
    attn_impl: str = "auto"
    dtype: str | None = None
    conv_layout: str = "nhwc"

    def setup(self):
        self.Unet1_encoder = Encoder(dtype=self.dtype,
                                     layout=self.conv_layout)
        self.Unet1_decoder = Decoder(num_instruments=2, dtype=self.dtype,
                                     layout=self.conv_layout)
        self.linear_onset = nn.Dense(N_KEYS, kernel_init=torch_conv_init)
        self.linear_feature = nn.Dense(N_KEYS, kernel_init=torch_conv_init)
        self.combine_stack = Stack(hidden_dim=768, attn_size=31,
                                   attn_group=6, output_dim=N_KEYS,
                                   dropout=0.0,
                                   attn_block_size=self.attn_block_size,
                                   attn_impl=self.attn_impl,
                                   dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        z, s, c = self.Unet1_encoder(x, train)
        y = self.Unet1_decoder(z, s, c, train)        # (B, T, F, 2)
        if self.conv_layout == "folded":
            y0, y1 = unfold_channels(
                y, unet_fold_specs(x.shape[2])[0], 2)
        else:
            y0, y1 = y[..., 0], y[..., 1]
        onset = nn.sigmoid(self.linear_onset(y0))
        feat = self.linear_feature(y1)
        h = jnp.concatenate([onset, feat], axis=-1)
        h, a = self.combine_stack(h, train)
        pianoroll = nn.sigmoid(h)
        return pianoroll, onset, a


class UNetOnsetModule(nn.Module):
    """Reference `UNet_Onset` forward (`model/UNet_onset.py:380-405`)."""
    n_bins: int = C.N_BINS
    reconstruction: bool = True
    attn_block_size: int = 128
    attn_impl: str = "auto"
    dtype: str | None = None
    conv_layout: str = "nhwc"

    def setup(self):
        self.transcriber = OnsetSpec2Roll(
            self.n_bins, attn_block_size=self.attn_block_size,
            attn_impl=self.attn_impl, dtype=self.dtype,
            conv_layout=self.conv_layout)
        if self.reconstruction:
            self.reconstructor = Roll2Spec(
                self.n_bins, attn_block_size=self.attn_block_size,
                attn_impl=self.attn_impl, dtype=self.dtype,
                conv_layout=self.conv_layout)

    def __call__(self, x, train: bool = False):
        pianoroll, onset, a = self.transcriber(x, train)
        if self.reconstruction:
            reconstruction, _ = self.reconstructor(pianoroll, train)
            pianoroll2, onset2, _ = self.transcriber(reconstruction, train)
            return reconstruction, pianoroll, onset, pianoroll2, onset2, a
        return pianoroll, onset, a

    def transcribe_heads(self, x, train: bool = False):
        """VAT target returning the {frame, onset} tree
        (reference `model/UNet_onset.py:118,132`)."""
        pianoroll, onset, _ = self.transcriber(x, train)
        return {"frame": pianoroll, "onset": onset}


@dataclasses.dataclass
class UNetOnset:
    """Batch contract for UNet_Onset (reference `model/UNet_onset.py:409-542`)."""
    log: bool = True
    reconstruction: bool = True
    mode: str = "imagewise"
    spec: str = "Mel"
    xi: float = 1e-6
    eps: float = 2.0
    kl_div: bool = False
    attn_block_size: int = 128
    attn_impl: str = "auto"   # 'auto' = XLA banded attention (measured
                              # winner, see nn/attention.resolve_attn_impl)
    conv_layout: str = "auto"  # 'auto' = frequency-folded U-Net on TPU
    compute_dtype: str | None = None
    # 'batched' = one frozen-BN 2B VAT chain over [labeled; unlabeled]
    # instead of the reference's two separate train-mode-BN chains — see
    # models/reconvat.ReconVAT.vat_chain for the semantics/divergence note
    vat_chain: str = "separate"
    n_heads: int = 4

    def __post_init__(self):
        from ..nn.unet import resolve_conv_layout

        self.frontend, self.n_bins = make_frontend(
            self.spec,
            precision=frontend_precision(self.compute_dtype))
        self.module = UNetOnsetModule(
            n_bins=self.n_bins,
            reconstruction=self.reconstruction,
            attn_block_size=self.attn_block_size,
            attn_impl=self.attn_impl,
            conv_layout=resolve_conv_layout(self.conv_layout),
            dtype=self.compute_dtype)
        self.normalize = Normalization(self.mode)
        self.vat_cfg = VATConfig(xi=self.xi, eps=self.eps, n_power=1,
                                 kl_div=self.kl_div, norm_axis=2)

    def init(self, key, seq_frames: int = 640):
        dummy = jnp.zeros((1, seq_frames, self.n_bins, 1))
        return self.module.init(key, dummy, train=False)

    def make_spec(self, audio, t_true=None):
        from ..parallel.mesh import spec_constraint

        from .common import make_log_norm_spec

        spec = make_log_norm_spec(self, audio, t_true)
        return spec_constraint(spec[..., None])

    def _apply(self, variables, x, train):
        if train:
            out, updates = self.module.apply(variables, x, train=True,
                                             mutable=["batch_stats"])
            return out, updates.get("batch_stats")
        return self.module.apply(variables, x, train=False), None

    def _transcriber_fn(self, variables, train):
        def fn(x):
            if train:
                out, _ = self.module.apply(
                    variables, x, train=True, mutable=["batch_stats"],
                    method=UNetOnsetModule.transcribe_heads)
                return out
            return self.module.apply(variables, x, train=False,
                                     method=UNetOnsetModule.transcribe_heads)
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

        batched_chain = (self.vat_chain == "batched" and vat
                         and batch_ul is not None)
        lds_ul = {"frame": zero, "onset": zero}
        r_norm_ul, spec_ul = zero, None
        if batch_ul is not None:
            spec_ul = self.make_spec(batch_ul["audio"])
            k_ul, key = jax.random.split(key)
            if not batched_chain:
                lds_ul, _, rn = vat_loss(
                    self._transcriber_fn(variables, train),
                    spec_ul, k_ul, self.vat_cfg)
                r_norm_ul = jnp.mean(jnp.abs(rn))

        spec = self.make_spec(batch_l["audio"], t_true)
        out, new_stats = self._apply(variables, spec, train)

        lds_l = {"frame": zero, "onset": zero}
        r_adv, r_norm_l = None, zero
        if vat:
            k_l, key = jax.random.split(key)
            # Reuse the supervised forward's clean {frame, onset} prediction
            # as the stop-grad VAT reference — this transcriber path is
            # deterministic (combine_stack dropout=0.0), so it is exactly
            # what vat_loss would recompute; XLA does not CSE the duplicate
            # forward (see vat.vat_loss y_ref).
            y_ref = ({"frame": out[1], "onset": out[2]}
                     if self.reconstruction
                     else {"frame": out[0], "onset": out[1]})
            if batched_chain:
                b = spec.shape[0]
                fn = self._transcriber_fn(variables, train=False)
                y_ref_ul = fn(spec_ul)
                x_all = jnp.concatenate([spec, spec_ul], axis=0)
                y_all = jax.tree_util.tree_map(
                    lambda a, u: jnp.concatenate([a, u], axis=0),
                    y_ref, y_ref_ul)
                (lds_l, lds_ul), r_adv, rn = vat_loss(
                    fn, x_all, k_l, self.vat_cfg, y_ref=y_all, split=b)
                r_norm_l = jnp.mean(jnp.abs(rn[:b]))
                r_norm_ul = jnp.mean(jnp.abs(rn[b:]))
                r_adv = r_adv[:b, ..., 0]
            else:
                lds_l, r_adv, rn = vat_loss(
                    self._transcriber_fn(variables, train),
                    spec, k_l, self.vat_cfg, y_ref=y_ref)
                r_adv = r_adv[..., 0]
                r_norm_l = jnp.mean(jnp.abs(rn))

        if self.reconstruction:
            reconstruction, pianoroll, onset, pianoroll2, onset2, a = out
            predictions = {
                "frame": pianoroll, "onset": onset,
                "frame2": pianoroll2, "onset2": onset2,
                "attention": a, "r_adv": r_adv,
                "reconstruction": reconstruction,
            }
            losses = {
                f"loss/{prefix}_reconstruction":
                    mse_loss(reconstruction[..., 0],
                             jax.lax.stop_gradient(spec[..., 0]), mask),
                f"loss/{prefix}_frame":
                    binary_cross_entropy(pianoroll, frame_label, mask),
                f"loss/{prefix}_frame2":
                    binary_cross_entropy(pianoroll2, frame_label, mask),
                f"loss/{prefix}_onset":
                    binary_cross_entropy(onset, onset_label, mask),
                f"loss/{prefix}_onset2":
                    binary_cross_entropy(onset2, onset_label, mask),
                f"loss/{prefix}_LDS_l_frame": lds_l["frame"],
                f"loss/{prefix}_LDS_l_onset": lds_l["onset"],
            }
        else:
            pianoroll, onset, a = out
            predictions = {"onset": onset, "frame": pianoroll,
                           "r_adv": r_adv, "attention": a}
            losses = {
                f"loss/{prefix}_frame":
                    binary_cross_entropy(pianoroll, frame_label, mask),
                f"loss/{prefix}_onset":
                    binary_cross_entropy(onset, onset_label, mask),
                f"loss/{prefix}_LDS_l_frame": lds_l["frame"],
                f"loss/{prefix}_LDS_l_onset": lds_l["onset"],
            }
        if train:
            losses[f"loss/{prefix}_LDS_ul_frame"] = lds_ul["frame"]
            losses[f"loss/{prefix}_LDS_ul_onset"] = lds_ul["onset"]
            losses[f"loss/{prefix}_r_norm_l"] = r_norm_l
            losses[f"loss/{prefix}_r_norm_ul"] = r_norm_ul
        else:
            losses[f"loss/{prefix}_r_norm_l"] = r_norm_l

        return predictions, losses, spec[..., 0], new_stats

    def transcribe(self, variables, audio, bucket_frames: int = 0):
        from .common import transcribe_spec

        spec, t_true = transcribe_spec(self, audio, bucket_frames)
        out = self.module.apply(variables, spec[..., None], train=False)
        if self.reconstruction:
            _, pianoroll, onset, _, _, _ = out
        else:
            pianoroll, onset, _ = out
        if bucket_frames:
            pianoroll, onset = pianoroll[:, :t_true], onset[:, :t_true]
        return {"onset": onset, "frame": pianoroll}

    def transcribe_streaming(self, variables, audio, window_frames=640,
                             halo_frames=128, windows_per_batch=1,
                             mesh_ctx=None, pipeline_depth=3):
        """Bounded-memory transcription (haloed fixed-shape windows) —
        see `models/common.transcribe_streaming`."""
        from .common import transcribe_streaming

        def forward(variables, spec_image):
            out = self.module.apply(variables, spec_image, train=False)
            if self.reconstruction:
                _, pianoroll, onset = out[0], out[1], out[2]
            else:
                pianoroll, onset = out[0], out[1]
            return {"onset": onset, "frame": pianoroll}

        return transcribe_streaming(self, forward, variables, audio,
                                    window_frames, halo_frames,
                                    windows_per_batch, mesh_ctx,
                                    pipeline_depth)

    def load_reference_weights(self, path: str, variables):
        from ..train.torch_convert import load_torch_checkpoint, torch_to_flax
        sd = load_torch_checkpoint(path)
        converted, report = torch_to_flax(sd, variables)
        # lstm1/linear1/dropout_layer exist in the reference state_dict but
        # are never used in its forward (`model/UNet_onset.py:289-294`).
        residual = [k for k in report["skipped"]
                    if not k.startswith(("spectrogram.", "normalize.",
                                         "vat_loss.", "transcriber.lstm1.",
                                         "transcriber.linear1."))]
        if residual:
            raise ValueError(f"unconverted model weights: {residual}")
        return converted
