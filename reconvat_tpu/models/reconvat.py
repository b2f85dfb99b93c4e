"""ReconVAT: U-Net transcriber + reconstruction consistency + VAT.

Port target: reference `UNet` (`model/self_attention_VAT.py:1014-1325`) with
`Spec2Roll` / `Roll2Spec` (`:929-969`). Flax submodule names match the torch
state_dict so released weights convert via `train.torch_convert`.

Architecture (all activations NHWC, time = H axis):
    spec (B,T,F,1) -> Spec2Roll: U-Net -> local window-31 attention over bins
    -> linear -> sigmoid -> pianoroll (B,T,88)
    if reconstruction: Roll2Spec(pianoroll) -> reconstruction (B,T,F,1)
                       Spec2Roll(reconstruction) -> pianoroll2
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

N_KEYS = C.N_KEYS


class Spec2Roll(nn.Module):
    """Reference `Spec2Roll` (`model/self_attention_VAT.py:929-945`)."""
    n_bins: int = C.N_BINS
    complexity: int = 4
    attn_block_size: int = 128
    attn_impl: str = "auto"
    dtype: str | None = None   # e.g. 'bfloat16' mixed precision
    conv_layout: str = "nhwc"  # 'folded' = frequency-folded TPU layout

    def setup(self):
        self.Unet1_encoder = Encoder(dtype=self.dtype,
                                     layout=self.conv_layout)
        self.Unet1_decoder = Decoder(num_instruments=1, dtype=self.dtype,
                                     layout=self.conv_layout)
        self.lstm1 = MultiHeadAttention1D(
            out_features=self.n_bins * self.complexity, kernel_size=31,
            groups=self.complexity, block_size=self.attn_block_size,
            impl=self.attn_impl, dtype=self.dtype)
        self.linear1 = nn.Dense(N_KEYS, kernel_init=torch_conv_init)

    def __call__(self, x, train: bool = False):
        z, s, c = self.Unet1_encoder(x, train)
        y = self.Unet1_decoder(z, s, c, train)          # (B, T, F, 1)
        if self.conv_layout == "folded":
            y3, = unfold_channels(y, unet_fold_specs(x.shape[2])[0], 1)
        else:
            y3 = y[..., 0]
        h, a = self.lstm1(y3)
        pianoroll = nn.sigmoid(self.linear1(h))
        return pianoroll, a


class Roll2Spec(nn.Module):
    """Reference `Roll2Spec` (`model/self_attention_VAT.py:947-969`)."""
    n_bins: int = C.N_BINS
    complexity: int = 4
    attn_block_size: int = 128
    attn_impl: str = "auto"
    dtype: str | None = None
    conv_layout: str = "nhwc"

    def setup(self):
        self.Unet2_encoder = Encoder(dtype=self.dtype,
                                     layout=self.conv_layout)
        self.Unet2_decoder = Decoder(num_instruments=1, dtype=self.dtype,
                                     layout=self.conv_layout)
        self.lstm2 = MultiHeadAttention1D(
            out_features=self.n_bins * self.complexity, kernel_size=31,
            groups=4, block_size=self.attn_block_size,
            impl=self.attn_impl, dtype=self.dtype)
        self.linear2 = nn.Dense(self.n_bins, kernel_init=torch_conv_init)

    def __call__(self, x, train: bool = False):
        h, a = self.lstm2(x)
        spec = nn.sigmoid(self.linear2(h))              # (B, T, F)
        z, s, c = self.Unet2_encoder(spec[..., None], train)
        reconstruction = self.Unet2_decoder(z, s, c, train)
        if self.conv_layout == "folded":
            r3, = unfold_channels(reconstruction,
                                  unet_fold_specs(spec.shape[2])[0], 1)
            reconstruction = r3[..., None]
        return reconstruction, a


class UNet(nn.Module):
    """Reference `UNet` forward (`model/self_attention_VAT.py:1061-1086`)."""
    n_bins: int = C.N_BINS
    reconstruction: bool = True
    attn_block_size: int = 128
    attn_impl: str = "auto"
    dtype: str | None = None
    conv_layout: str = "nhwc"

    def setup(self):
        self.transcriber = Spec2Roll(self.n_bins,
                                     attn_block_size=self.attn_block_size,
                                     attn_impl=self.attn_impl,
                                     dtype=self.dtype,
                                     conv_layout=self.conv_layout)
        if self.reconstruction:
            self.reconstructor = Roll2Spec(
                self.n_bins, attn_block_size=self.attn_block_size,
                attn_impl=self.attn_impl, dtype=self.dtype,
                conv_layout=self.conv_layout)

    def __call__(self, x, train: bool = False):
        pianoroll, a = self.transcriber(x, train)
        if self.reconstruction:
            reconstruction, _ = self.reconstructor(pianoroll, train)
            pianoroll2, _ = self.transcriber(reconstruction, train)
            return reconstruction, pianoroll, pianoroll2, a
        return pianoroll, a

    def transcribe_frames(self, x, train: bool = False):
        """Transcriber-only path attacked by VAT
        (reference `UNet_VAT.forward`, `model/self_attention_VAT.py:162-202`)."""
        pianoroll, _ = self.transcriber(x, train)
        return pianoroll


@dataclasses.dataclass
class ReconVAT:
    """The flagship model + its signal chain and batch contract.

    Mirrors the reference constructor flags
    (`model/self_attention_VAT.py:1015`).
    """
    log: bool = True
    reconstruction: bool = True
    mode: str = "imagewise"
    spec: str = "Mel"
    xi: float = 1e-6
    eps: float = 2.0
    kl_div: bool = False
    attn_block_size: int = 128
    attn_impl: str = "auto"    # 'auto' = XLA banded attention (measured
                               # winner, see nn/attention.resolve_attn_impl)
    conv_layout: str = "auto"  # 'auto' = frequency-folded U-Net on TPU
                               # (see nn/unet.py), plain NHWC elsewhere
    compute_dtype: str | None = None  # 'bfloat16' = mixed-precision compute
                                      # (params/BN/heads/losses stay fp32)
    # 'separate' = the reference's two VAT chains (labeled + unlabeled),
    # each a train-mode (batch-statistics BN) B-sized pass sequence.
    # 'batched' = one frozen-BN (running statistics) 2B-chain: the power
    # iteration and adversarial forward run once on [spec_l; spec_ul],
    # halving chain launches and presenting larger matmuls. Documented
    # divergence: BN inside the adversarial search then uses running
    # averages (the original VAT recipe; the reference uses train-mode
    # BN) — per-segment losses are otherwise exactly the separate
    # frozen-BN chains (tests/test_vat_batched_chain.py).
    vat_chain: str = "separate"
    n_heads: int = 4  # for attention visualization metadata

    def __post_init__(self):
        from ..nn.unet import resolve_conv_layout

        self.frontend, self.n_bins = make_frontend(
            self.spec,
            precision=frontend_precision(self.compute_dtype))
        self.module = UNet(n_bins=self.n_bins,
                           reconstruction=self.reconstruction,
                           attn_block_size=self.attn_block_size,
                           attn_impl=self.attn_impl,
                           conv_layout=resolve_conv_layout(self.conv_layout),
                           dtype=self.compute_dtype)
        self.normalize = Normalization(self.mode)
        # spec image is (B, T, F, 1): the per-vector L2 norm of the VAT
        # perturbation runs over the bins axis like the reference's
        # dim=-1 on (B, 1, T, F).
        self.vat_cfg = VATConfig(xi=self.xi, eps=self.eps, n_power=1,
                                 kl_div=self.kl_div, norm_axis=2)

    # -- plumbing ----------------------------------------------------------
    def init(self, key, seq_frames: int = 640):
        dummy = jnp.zeros((1, seq_frames, self.n_bins, 1))
        return self.module.init(key, dummy, train=False)

    def make_spec(self, audio, t_true=None):
        """audio (B, N) float in [-1, 1] -> normalized log-spec (B,T,F,1).

        Drops the final sample so 327680-sample crops give exactly 640
        frames (reference `model/self_attention_VAT.py:1112`). t_true masks
        the normalization statistics to the true frames of a padded clip
        (bucketed full-song evaluation).
        """
        from ..parallel.mesh import spec_constraint

        from .common import make_log_norm_spec

        spec = make_log_norm_spec(self, audio, t_true)
        return spec_constraint(spec[..., None])

    def _apply(self, variables, x, train: bool):
        if train:
            out, updates = self.module.apply(variables, x, train=True,
                                             mutable=["batch_stats"])
            return out, updates.get("batch_stats")
        return self.module.apply(variables, x, train=False), None

    def _transcriber_fn(self, variables, train: bool):
        """VAT target: transcriber-only forward, batch-stat updates
        discarded (BN uses batch statistics but the model state does not
        drift during the adversarial search)."""
        def fn(x):
            if train:
                out, _ = self.module.apply(
                    variables, x, train=True, mutable=["batch_stats"],
                    method=UNet.transcribe_frames)
                return out
            return self.module.apply(variables, x, train=False,
                                     method=UNet.transcribe_frames)
        return fn

    # -- batch contract ------------------------------------------------------
    def run_on_batch(self, variables, batch_l, batch_ul=None, key=None,
                     vat: bool = False, train: bool = True, t_true=None):
        """Functional counterpart of reference `UNet.run_on_batch`
        (`model/self_attention_VAT.py:1090-1203`).

        Returns (predictions, losses, spec (B,T,F), new_batch_stats).
        t_true (traced scalar) masks spec normalization and losses to the
        true frames of a bucket-padded full song — losses then equal the
        exact-shape computation up to the receptive-field halo at clip end.
        """
        from .common import frame_mask

        prefix = "train" if train else "test"
        frame_label = batch_l["frame"]
        mask = (None if t_true is None
                else frame_mask(t_true, frame_label.shape[1]))
        zero = jnp.zeros(())

        batched_chain = (self.vat_chain == "batched" and vat
                         and batch_ul is not None)
        lds_ul, r_norm_ul, spec_ul = zero, zero, None
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

        lds_l, r_adv, r_norm_l = zero, None, zero
        if vat:
            k_l, key = jax.random.split(key)
            # The supervised forward above already computed the clean
            # transcriber prediction on this exact spec (deterministically —
            # no dropout in this path), so hand it to vat_loss as the
            # stop-grad reference instead of paying a second clean forward.
            # XLA does not CSE the duplicate (measured −3.3% step FLOPs,
            # −2.5% bytes); the math is identical either way.
            y_ref = out[1] if self.reconstruction else out[0]
            if batched_chain:
                # one frozen-BN 2B chain over [labeled; unlabeled] — see
                # the vat_chain field doc for the semantics
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
                r_adv = r_adv[..., 0]  # drop channel dim like the reference
                r_norm_l = jnp.mean(jnp.abs(rn))

        if self.reconstruction:
            reconstruction, pianoroll, pianoroll2, a = out
            predictions = {
                "onset": pianoroll, "frame": pianoroll,
                "frame2": pianoroll2, "onset2": pianoroll2,
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
                f"loss/{prefix}_LDS_l": lds_l,
            }
        else:
            pianoroll, a = out
            predictions = {"onset": pianoroll, "frame": pianoroll,
                           "attention": a, "r_adv": r_adv}
            losses = {
                f"loss/{prefix}_frame":
                    binary_cross_entropy(pianoroll, frame_label, mask),
                f"loss/{prefix}_LDS_l": lds_l,
            }
        if train:
            losses[f"loss/{prefix}_LDS_ul"] = lds_ul
            losses[f"loss/{prefix}_r_norm_l"] = r_norm_l
            losses[f"loss/{prefix}_r_norm_ul"] = r_norm_ul
        else:
            losses[f"loss/{prefix}_r_norm_l"] = r_norm_l

        return predictions, losses, spec[..., 0], new_stats

    def run_on_batch_application(self, variables, batch_l, batch_ul=None,
                                 key=None, vat: bool = False,
                                 train: bool = True):
        """Application-domain semi-supervised fine-tuning (reference
        `UNet.run_on_batch_application`, `model/self_attention_VAT.py:
        1205-1291`): adds an unlabeled-consistency term
        BCE(ul_frame2, stop_grad(ul_frame)) between the two transcriber
        views of the unlabeled audio."""
        if not self.reconstruction:
            raise ValueError("run_on_batch_application requires "
                             "reconstruction=True")
        prefix = "train" if train else "test"
        frame_label = batch_l["frame"]
        zero = jnp.zeros(())

        lds_ul, r_norm_ul = zero, zero
        ul_consistency = zero
        if batch_ul is not None:
            spec_ul = self.make_spec(batch_ul["audio"])
            k_ul, key = jax.random.split(key)
            ul_out, _ = self._apply(variables, spec_ul, train)
            _, ul_pianoroll, ul_pianoroll2, _ = ul_out
            # clean-forward reuse, same rationale as run_on_batch
            lds_ul, _, rn = vat_loss(self._transcriber_fn(variables, train),
                                     spec_ul, k_ul, self.vat_cfg,
                                     y_ref=ul_pianoroll)
            r_norm_ul = jnp.mean(jnp.abs(rn))
            ul_consistency = binary_cross_entropy(
                ul_pianoroll2, jax.lax.stop_gradient(ul_pianoroll))

        spec = self.make_spec(batch_l["audio"])
        out, new_stats = self._apply(variables, spec, train)

        lds_l, r_adv, r_norm_l = zero, None, zero
        if vat:
            k_l, key = jax.random.split(key)
            lds_l, r_adv, rn = vat_loss(self._transcriber_fn(variables,
                                                             train),
                                        spec, k_l, self.vat_cfg,
                                        y_ref=out[1])
            r_adv = r_adv[..., 0]
            r_norm_l = jnp.mean(jnp.abs(rn))
        reconstruction, pianoroll, pianoroll2, a = out
        predictions = {
            "onset": pianoroll, "frame": pianoroll,
            "frame2": pianoroll2, "onset2": pianoroll2,
            "attention": a, "r_adv": r_adv,
            "reconstruction": reconstruction,
        }
        losses = {
            f"loss/{prefix}_reconstruction":
                mse_loss(reconstruction[..., 0],
                         jax.lax.stop_gradient(spec[..., 0])),
            f"loss/{prefix}_frame":
                binary_cross_entropy(pianoroll, frame_label),
            f"loss/{prefix}_frame2":
                binary_cross_entropy(pianoroll2, frame_label),
            f"loss/{prefix}_LDS_l": lds_l,
        }
        if train:
            losses["loss/ul_consistency_wrt1"] = ul_consistency
            losses[f"loss/{prefix}_LDS_ul"] = lds_ul
            losses[f"loss/{prefix}_r_norm_l"] = r_norm_l
            losses[f"loss/{prefix}_r_norm_ul"] = r_norm_ul
        else:
            losses[f"loss/{prefix}_r_norm_l"] = r_norm_l
        return predictions, losses, spec[..., 0], new_stats

    def transcribe(self, variables, audio, bucket_frames: int = 0):
        """Deployment path (reference `UNet.transcribe`,
        `model/self_attention_VAT.py:1293-1314`): onset roll == frame roll.

        bucket_frames > 0 pads the clip to a frame-bucket boundary so
        arbitrary-length songs reuse a handful of compiled shapes (the
        reference recompiles nothing because torch is eager; under jit,
        exact per-song shapes would recompile per length). Normalization
        statistics are computed over the true frames only, and the padded
        tail is trimmed before returning — output differs from the exact
        path only within the receptive-field halo at the clip end.
        """
        from .common import transcribe_spec

        spec, t_true = transcribe_spec(self, audio, bucket_frames)
        spec = spec[..., None]
        out = self.module.apply(variables, spec, train=False)
        if self.reconstruction:
            _, pianoroll, _, _ = out
        else:
            pianoroll, _ = out
        if bucket_frames:
            pianoroll = pianoroll[:, :t_true]
        return {"onset": pianoroll, "frame": pianoroll}

    def transcribe_streaming(self, variables, audio, window_frames=640,
                             halo_frames=128, windows_per_batch=1,
                             mesh_ctx=None, pipeline_depth=3):
        """Bounded-memory transcription for hour-scale recordings: haloed
        fixed-shape windows with song-global normalization statistics;
        peak memory is O(window + 2*halo) regardless of length. Matches
        `transcribe` wherever the halo covers the transcriber's receptive
        field. `windows_per_batch`/`mesh_ctx` batch the same-shape windows
        into one forward and shard them over a device mesh;
        `pipeline_depth` keeps that many window forwards in flight with
        async D2H (see `models/common.transcribe_streaming`)."""
        from .common import transcribe_streaming

        def forward(variables, spec_image):
            out = self.module.apply(variables, spec_image, train=False)
            return out[1] if self.reconstruction else out[0]

        roll = transcribe_streaming(self, forward, variables, audio,
                                    window_frames, halo_frames,
                                    windows_per_batch, mesh_ctx,
                                    pipeline_depth)
        return {"onset": roll, "frame": roll}

    # -- weights -------------------------------------------------------------
    def load_reference_weights(self, path: str, variables):
        """Load a released torch `.pt` state_dict onto this model."""
        from ..train.torch_convert import load_torch_checkpoint, torch_to_flax
        sd = load_torch_checkpoint(path)
        converted, report = torch_to_flax(sd, variables)
        # frontend buffers & vat module have no flax counterpart
        residual = [k for k in report["skipped"]
                    if not k.startswith(("spectrogram.", "normalize.",
                                         "vat_loss."))]
        if residual:
            raise ValueError(f"unconverted model weights: {residual}")
        return converted
