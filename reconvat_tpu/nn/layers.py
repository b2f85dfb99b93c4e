"""Conv trunk and recurrent stacks for the Onsets-and-Frames family.

Ports of reference `ConvStack` / `Onset_Stack` / `Combine_Stack`
(`model/onset_frame_VAT.py:321-414`). The BiLSTM runs as a `lax.scan`
over the recurrence only (input projections hoisted, see BiLSTM) — the
reference's cuDNN eval-mode workaround (flipping the module to train() to
run the LSTM, `model/onset_frame_VAT.py:370-381`) is deliberately NOT
replicated; scan has no such issue.
"""
from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .unet import torch_conv_init


class ConvStack(nn.Module):
    """O&F conv trunk: 3 convs + 2 (1,2) freq max-pools + dropout -> FC."""
    input_features: int
    output_features: int
    dtype: str | None = None   # computation dtype; params/BN stay fp32

    def setup(self):
        of = self.output_features
        p = [(1, 1), (1, 1)]
        self.conv0 = nn.Conv(of // 16, (3, 3), padding=p,
                             kernel_init=torch_conv_init, dtype=self.dtype)
        self.bn0 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.conv1 = nn.Conv(of // 16, (3, 3), padding=p,
                             kernel_init=torch_conv_init, dtype=self.dtype)
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.conv2 = nn.Conv(of // 8, (3, 3), padding=p,
                             kernel_init=torch_conv_init, dtype=self.dtype)
        self.bn2 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.fc = nn.Dense(of, kernel_init=torch_conv_init,
                           dtype=self.dtype)
        self.drop1 = nn.Dropout(0.25)
        self.drop2 = nn.Dropout(0.25)
        self.drop_fc = nn.Dropout(0.5)

    def __call__(self, spec, train: bool = False):
        """spec (B, T, F) -> (B, T, output_features)."""
        x = spec[..., None]  # NHWC, freq as W
        x = nn.relu(self.bn0(self.conv0(x), use_running_average=not train))
        x = nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        x = nn.max_pool(x, (1, 2), strides=(1, 2))
        x = self.drop1(x, deterministic=not train)
        x = nn.relu(self.bn2(self.conv2(x), use_running_average=not train))
        x = nn.max_pool(x, (1, 2), strides=(1, 2))
        x = self.drop2(x, deterministic=not train)
        # (B, T, F/4, C) -> channel-major flatten like torch's
        # transpose(1, 2).flatten(-2) on NCHW
        B, T, F, C = x.shape
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(B, T, C * F)
        x = self.fc(x)
        x = self.drop_fc(x, deterministic=not train)
        return x


class BiLSTM(nn.Module):
    """Bidirectional LSTM, output width = 2 * hidden_size.

    torch.nn.LSTM semantics (gate order i,f,g,o; effective bias =
    bias_ih + bias_hh; weights U(+-1/sqrt(H)), fused bias = sum of two
    independent U(+-1/sqrt(H)) draws matching torch's b_ih + b_hh
    distribution) — parity-tested against the reference's
    `torch.nn.LSTM` in test_onsets_frames.py.

    TPU-first: the input projection for every timestep is hoisted out of
    the recurrence into one large (B*T, F) x (F, 4H) MXU matmul per
    direction; `lax.scan` then carries only the (h, c) state and the
    small H x 4H recurrent matmul. This halves the serial per-step work
    vs scanning a whole LSTM cell (cuDNN performs the same hoist on GPU).
    """
    hidden_size: int

    @nn.compact
    def __call__(self, x):
        # recurrence always runs fp32 (policy: bf16 error would compound
        # over 640 steps; see OnsetStack) — cast bf16 conv-trunk inputs up
        x = x.astype(jnp.float32)
        B, T, F = x.shape
        H = self.hidden_size
        init = nn.initializers.uniform(scale=2.0 / np.sqrt(H))

        def shifted(key, shape, dtype=jnp.float32):
            # torch LSTM init: U(-1/sqrt(H), 1/sqrt(H))
            return init(key, shape, dtype) - 1.0 / np.sqrt(H)

        def bias_init(key, shape, dtype=jnp.float32):
            # the fused bias stands for torch's b_ih + b_hh: the sum of two
            # independent U(-1/sqrt(H), 1/sqrt(H)) draws (triangular on
            # +-2/sqrt(H)), so fresh-init variance matches torch exactly
            k1, k2 = jax.random.split(key)
            return shifted(k1, shape, dtype) + shifted(k2, shape, dtype)

        params = {d: (self.param(f"{d}_w_ih", shifted, (F, 4 * H)),
                      self.param(f"{d}_w_hh", shifted, (H, 4 * H)),
                      self.param(f"{d}_bias", bias_init, (4 * H,)))
                  for d in ("fwd", "bwd")}

        # Both directions advance in ONE scan (stacked direction axis d):
        # two separate scans would run 2T serial steps, and the scan is
        # latency-bound on TPU, not FLOP-bound — doubling the (tiny)
        # per-step matmul while halving the step count is ~2x on the
        # recurrence. The backward direction's inputs are time-flipped so
        # a single forward scan advances both recurrences; per-direction
        # math (einsum contraction per d) is unchanged vs two scans.
        w_ih = jnp.stack([params["fwd"][0], params["bwd"][0]])  # (2,F,4H)
        w_hh = jnp.stack([params["fwd"][1], params["bwd"][1]])  # (2,H,4H)
        bias = jnp.stack([params["fwd"][2], params["bwd"][2]])  # (2,4H)

        xw = jnp.einsum("btf,dfg->dbtg", x, w_ih) \
            + bias[:, None, None]                       # hoisted, (2,B,T,4H)
        xw = jnp.stack([xw[0], xw[1, :, ::-1]])         # flip bwd time
        xw = jnp.moveaxis(xw, 2, 0)                     # (T, 2, B, 4H)

        def step(carry, xw_t):
            h, c = carry                                # (2, B, H)
            gates = xw_t + jnp.einsum("dbh,dhg->dbg", h, w_hh)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
            h = nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        # unroll > 1 trades code size for fewer while-loop trips (the
        # scan is latency-bound); numerics are identical at any value.
        # Measured on v5e (bench_logs/r4_of_unroll{1,4,8}.log, O&F VAT
        # step): unroll 1/4/8 land within ~2% (61.3/62.4/60.6 ms bf16),
        # so the default stays 1; RECONVAT_LSTM_UNROLL overrides.
        unroll = int(os.environ.get("RECONVAT_LSTM_UNROLL", "1"))
        zero = jnp.zeros((2, B, H), x.dtype)
        _, ys = jax.lax.scan(step, (zero, zero), xw,
                             unroll=unroll)             # (T, 2, B, H)
        fwd = jnp.swapaxes(ys[:, 0], 0, 1)
        bwd = jnp.swapaxes(ys[::-1, 1], 0, 1)           # unflip bwd time
        return jnp.concatenate([fwd, bwd], axis=-1)


class OnsetStack(nn.Module):
    """Reference `Onset_Stack` (`model/onset_frame_VAT.py:357-387`).

    dtype applies to the conv trunk only: the BiLSTM recurrence and the
    output head stay fp32 (the scan is latency-bound, not FLOP-bound, and
    bf16 error would compound over 640 steps).
    """
    input_features: int
    model_size: int
    output_features: int
    use_lstm: bool = True
    dtype: str | None = None

    def setup(self):
        self.convstack = ConvStack(self.input_features, self.model_size,
                                   dtype=self.dtype)
        if self.use_lstm:
            self.sequence_model = BiLSTM(self.model_size // 2)
        self.linear = nn.Dense(self.output_features,
                               kernel_init=torch_conv_init)

    def __call__(self, x, train: bool = False):
        x = self.convstack(x, train)
        if self.use_lstm:
            x = self.sequence_model(x)
        x = self.linear(x)
        return nn.sigmoid(x)


class CombineStack(nn.Module):
    """Reference `Combine_Stack` (`model/onset_frame_VAT.py:390-414`)."""
    model_size: int
    output_features: int
    use_lstm: bool = True

    def setup(self):
        if self.use_lstm:
            self.sequence_model = BiLSTM(self.model_size // 2)
        self.linear = nn.Dense(self.output_features,
                               kernel_init=torch_conv_init)

    def __call__(self, x, train: bool = False):
        if self.use_lstm:
            x = self.sequence_model(x)
        x = self.linear(x)
        return nn.sigmoid(x)


# ---------------------------------------------------------------------------
# torch LSTM weight conversion
# ---------------------------------------------------------------------------

def lstm_torch_entries(prefix_torch, prefix_flax, state_dict):
    """Yield (flax_path, value) pairs converting a torch bidirectional LSTM
    (`weight_ih_l0[_reverse]` etc., gate order i,f,g,o) to our BiLSTM.
    torch stores (4H, F) row-chunked [i; f; g; o]; ours is the transpose
    with the same gate-chunk order, and one fused bias = b_ih + b_hh."""
    out = {}
    for direction, sub in [("", "fwd"), ("_reverse", "bwd")]:
        w_ih = state_dict.get(f"{prefix_torch}.weight_ih_l0{direction}")
        w_hh = state_dict.get(f"{prefix_torch}.weight_hh_l0{direction}")
        b_ih = state_dict.get(f"{prefix_torch}.bias_ih_l0{direction}")
        b_hh = state_dict.get(f"{prefix_torch}.bias_hh_l0{direction}")
        if w_ih is None:
            continue
        out[f"{prefix_flax}/{sub}_w_ih"] = np.asarray(w_ih).T
        out[f"{prefix_flax}/{sub}_w_hh"] = np.asarray(w_hh).T
        if b_ih is not None:
            out[f"{prefix_flax}/{sub}_bias"] = (np.asarray(b_ih)
                                                + np.asarray(b_hh))
    return out
