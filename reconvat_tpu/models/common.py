"""Shared signal-chain and bucketing helpers for all model families.

The reference evaluates full songs eagerly at their exact length
(`model/helper_functions.py:65`, `evaluate.py:86-90`) — free in torch,
pathological under jit (one recompile per song length). Every model here
instead supports a *bucketed* path: the song is padded to a small ladder of
frame counts, the spectrogram normalization statistics and the losses are
masked to the true frames, and predictions are trimmed before returning.
Outputs differ from the exact path only inside the network's receptive-field
halo at the clip end (window-31 attention: 15 frames; U-Net convs: a few
dozen more).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as C

# Doubling ladder: any song up to ~10.9 min compiles one of 7 shapes;
# longer songs extend the ladder by further doubling.
BUCKET_LADDER = (640, 1280, 2560, 5120, 10240, 20480)


def next_bucket(t_true: int, ladder=BUCKET_LADDER) -> int:
    for b in ladder:
        if t_true <= b:
            return b
    b = ladder[-1]
    while b < t_true:
        b *= 2
    return b


def frames_in(n_samples: int) -> int:
    """Frame count produced by the signal chain for an n-sample clip
    (the chain drops the final sample: 327680 samples -> 640 frames,
    reference `model/self_attention_VAT.py:1112`)."""
    return (n_samples - 1) // C.HOP_LENGTH + 1


def frame_mask(t_true, n_frames: int):
    """Boolean (n_frames,) mask of the true (unpadded) frames; t_true may be
    a traced scalar so one compiled shape serves every song in the bucket."""
    return jnp.arange(n_frames) < t_true


def make_log_spec(model, audio):
    """audio (B, N) float in [-1, 1] -> un-normalized (log-)spec (B, T, F):
    frontend (dropping the final sample, reference
    `model/self_attention_VAT.py:1112`) -> log(x+1e-5)."""
    spec = model.frontend(audio[:, :-1])
    if getattr(model, "log", True):
        spec = jnp.log(spec + 1e-5)
    return spec


def make_log_norm_spec(model, audio, t_true=None):
    """audio (B, N) float in [-1, 1] -> normalized (log-)spec (B, T, F).

    The common chain of every model family (frontend -> log(x+1e-5) ->
    min-max normalize). With t_true, the normalization statistics cover only
    the true frames of a padded clip.
    """
    spec = make_log_spec(model, audio)
    mask = None if t_true is None else frame_mask(t_true, spec.shape[1])
    return model.normalize(spec, mask)


def pad_audio_to_frames(audio, t_pad: int):
    """Right-pad (B, N) audio so the signal chain yields exactly t_pad
    frames: the chain drops the last sample, and t_pad*HOP - 1 samples give
    1 + (t_pad*HOP - 1)//HOP = t_pad frames.

    The pad begins with a reflection of the signal end — exactly what the
    frontend's center-padding would synthesize there in the exact-shape
    path — so spectrogram frames below t_true are bit-identical to the
    unpadded computation (they'd otherwise see zeros where the exact path
    reflects), then zeros.
    """
    n_pad = t_pad * C.HOP_LENGTH
    n = audio.shape[1]
    assert n <= n_pad, (audio.shape, t_pad)
    if n == n_pad:
        return audio
    xp = jnp if isinstance(audio, jnp.ndarray) else np
    # the chain drops the last sample, so the signal the frontend reflects
    # around in the exact path is audio[:, :-1] — reflect that, then zeros,
    # then one trailing sample for the chain to drop
    x = audio[:, :-1]
    pad = (n_pad - 1) - x.shape[1]
    r = min(pad, x.shape[1] - 1)
    out = xp.pad(x, ((0, 0), (0, r)), mode="reflect")
    return xp.pad(out, ((0, 0), (0, pad - r + 1)))


def pad_song_batch(item, t_pad: int):
    """Host-side: full-song label dict -> batch-of-1 dict padded to t_pad
    frames. Returns (batch, t_true)."""
    audio = np.asarray(item["audio"])
    if audio.ndim == 1:
        audio = audio[None]
    t_true = frames_in(audio.shape[1])
    assert t_true <= t_pad, (t_true, t_pad)
    batch = {"audio": np.asarray(pad_audio_to_frames(audio, t_pad))}
    for k in ("onset", "offset", "frame", "velocity"):
        if k in item:
            v = np.asarray(item[k])
            if v.ndim == 2:
                v = v[None]
            batch[k] = np.pad(v, ((0, 0), (0, t_pad - v.shape[1]), (0, 0)))
    return batch, t_true


def pack_roll_device(probs, threshold=0.5):
    """Threshold a (B, T, P) posteriogram and bit-pack it on device.

    The serving D2H reduction: fp32 rolls are 32x the bytes of the
    packed bits, and the host decoder only needs booleans (strict >
    threshold, reference `model/decoding.py:14-21` semantics). Bit j of
    byte k = pitch k*8+j (little bit order) — the layout
    `decode.unpack_roll` / `decode.extract_notes_packed_batch` consume.
    Returns (B, T, ceil(P/8)) uint8.
    """
    B, T, P = probs.shape
    K = -(-P // 8)
    bits = (probs > threshold).astype(jnp.uint8)
    bits = jnp.pad(bits, ((0, 0), (0, 0), (0, K * 8 - P)))
    pow2 = jnp.asarray(2 ** np.arange(8), jnp.uint8)
    packed = jnp.einsum("btkj,j->btk", bits.reshape(B, T, K, 8), pow2)
    return packed.astype(jnp.uint8)


def transcribe_spec(model, audio, bucket_frames: int = 0):
    """Deployment-path spec preparation shared by every model's
    `transcribe`: returns (spec (B,T,F), t_true or None).

    bucket_frames > 0 pads the clip to a frame-bucket boundary so
    arbitrary-length songs reuse a handful of compiled shapes; the caller
    trims the returned rolls to t_true.
    """
    if not bucket_frames:
        return make_log_norm_spec(model, audio), None
    t_true = frames_in(audio.shape[1])
    t_pad = -(-t_true // bucket_frames) * bucket_frames
    audio = pad_audio_to_frames(audio, t_pad)
    return make_log_norm_spec(model, audio, t_true), t_true


# ---------------------------------------------------------------------------
# streaming (bounded-memory) full-song transcription
# ---------------------------------------------------------------------------

def _frame_slice_audio(audio, f0: int, f1: int, t_pad: int):
    """Audio samples whose signal chain reproduces frames [f0, f1) of the
    full song, right-padded (reflect, like the exact path's center pad at
    the song end) to exactly t_pad frames.

    Frame t of a slice starting at sample f0*HOP has the same sample
    center as frame f0+t of the full song, so interior frames are
    bit-identical; only the ~2 frames nearest a *cut* edge see the
    slice's reflect padding instead of true context (they land in the
    discarded halo; at the true song edges the slice edge IS the song
    edge, so even those match the exact path)."""
    n = audio.shape[1]
    # f1*HOP samples cover frames [f0, f1) (the chain drops the final
    # sample anyway; missing tail samples only perturb halo-edge frames)
    s0, s1 = f0 * C.HOP_LENGTH, min(n, f1 * C.HOP_LENGTH)
    return pad_audio_to_frames(audio[:, s0:s1], t_pad)


def transcribe_streaming(model, forward, variables, audio,
                         window_frames: int = 640, halo_frames: int = 128,
                         windows_per_batch: int = 1, mesh_ctx=None,
                         pipeline_depth: int = 3):
    """Bounded-memory full-song transcription: haloed fixed-shape windows.

    The bucketed path (`transcribe_spec`) materializes the whole song's
    activations at once — fine to ~10 min of audio, not for hour-scale
    recordings. This path keeps peak memory at
    O(window_frames + 2*halo_frames) regardless of song length:

    1. `imagewise` normalization needs the song-global log-spec min/max:
       pass 1 accumulates them over spectrogram chunks (interior frames
       only, so the statistics equal the full-song ones bit-for-bit; the
       spectrogram is tiny next to the network activations).
    2. pass 2 transcribes each window with `halo_frames` of real context
       per side, normalized by the global statistics, and keeps only the
       interior.

    Interior outputs equal the full-song path wherever the halo covers
    the transcriber's receptive field (window-31 attention = +-15 plus
    one U-Net encoder/decoder = a few dozen; halo 128 is comfortably
    beyond — asserted against the bucketed path in
    tests/test_streaming_transcribe.py). `forward(variables, spec_image)`
    is the model's deployment forward, returning a (B, T, out_pitches)
    roll or any pytree of such rolls (UNetOnset returns {frame, onset}).

    `windows_per_batch=G` stacks G same-shape windows into one forward
    (leading axis G*B): per-window math is unchanged, but an hour-scale
    song needs G× fewer device round trips and fills the chip at B=1.
    Peak memory grows with G. With `mesh_ctx` (a `parallel.mesh
    .MeshContext`), the stacked window axis is sharded over the mesh's
    batch axis — multi-chip serving of one long recording (G*B must
    divide by the axis size).

    `pipeline_depth=D` keeps up to D window forwards in flight and starts
    each result's device->host copy asynchronously as soon as it is
    enqueued (single-device only — sharded outputs fetch on consume), so
    the device executes back to back instead of stalling on the host's
    per-group fetch + interior-scatter round trip — the same software
    pipeline that took bench.py's serving loop from 51 to 18.3 ms/batch
    (bench_logs/r4_infer_pipeline_ab.log). Peak memory grows by D-1
    window outputs (rolls, not activations). Output is identical for any
    depth.

    Reference context: `model/self_attention_VAT.py:1293-1314` runs full
    songs in one eager forward — unbounded memory; this is the TPU-native
    serving equivalent.
    """
    import jax

    # Jitted callables are cached on the model instance so a directory of
    # recordings traces/compiles the forward once, not once per song.
    # `forward` is a fresh closure each call but always the same code
    # closing over the same model — key by its code object.
    cache = getattr(model, "_streaming_jit_cache", None)
    if cache is None:
        cache = model._streaming_jit_cache = {}

    B, n = audio.shape
    t_true = frames_in(n)
    W, H = int(window_frames), int(halo_frames)
    assert H >= 8, "halo must cover the spectrogram edge frames"
    # multiples of the U-Net's total time stride keep every window's
    # strided-conv grids anchored exactly like the full-song run
    assert W % 16 == 0 and H % 16 == 0, (W, H)
    span = W + 2 * H

    if t_true <= span:  # short clip: one bucketed call is already bounded
        key = ("short", forward.__code__)
        if key not in cache:
            def _short(variables, a, t):
                spec = make_log_norm_spec(model, a, t)
                return forward(variables, spec[..., None])
            cache[key] = jax.jit(_short)
        rolls = cache[key](variables, pad_audio_to_frames(audio, span),
                           t_true)
        return jax.tree_util.tree_map(lambda r: r[:, :t_true], rolls)

    # pass 1: global normalization statistics (imagewise only)
    imagewise = getattr(model.normalize, "mode", "imagewise") == "imagewise"
    gmin = gmax = None
    if imagewise:
        if "spec_chunk" not in cache:
            cache["spec_chunk"] = jax.jit(lambda a: make_log_spec(model, a))
        spec_chunk = cache["spec_chunk"]
        mins, maxs = [], []
        E = 4  # spectrogram edge halo (center window 2048 = 4 hops)
        for w0 in range(0, t_true, W):
            w1 = min(t_true, w0 + W)
            f0, f1 = max(0, w0 - E), min(t_true, w1 + E)
            chunk = spec_chunk(_frame_slice_audio(audio, f0, f1, W + 2 * E))
            keep = chunk[:, w0 - f0:w1 - f0]
            # per batch element, like normalize_imagewise's per-image stats.
            # Keep the per-chunk reductions on device and fetch once after
            # the loop — a blocking np.asarray here would serialize every
            # chunk dispatch on a host round trip.
            mins.append(jnp.min(keep, axis=(1, 2)))
            maxs.append(jnp.max(keep, axis=(1, 2)))
        gmin = jnp.asarray(np.min([np.asarray(m) for m in mins],
                                  axis=0)).reshape(B, 1, 1)
        gmax = jnp.asarray(np.max([np.asarray(m) for m in maxs],
                                  axis=0)).reshape(B, 1, 1)

    # pass 2: haloed windows, one compiled shape
    key = ("window", forward.__code__, imagewise)
    if key not in cache:
        def _window(variables, a, lo, hi):
            spec = make_log_spec(model, a)
            if imagewise:
                spec = (spec - lo) / (hi - lo)
            else:
                spec = model.normalize(spec)
            return forward(variables, spec[..., None])
        cache[key] = jax.jit(_window)
    window = cache[key]

    # Window starts, padded to a multiple of G with duplicates of the
    # last start (their outputs are discarded) so every group runs the
    # one compiled (G*B, span) shape.
    G = max(1, int(windows_per_batch))
    starts = list(range(0, t_true, W))
    n_real = len(starts)
    while len(starts) % G:
        starts.append(starts[-1])

    lo = hi = None
    if imagewise:  # (G*B, 1, 1), g*B+b ordering matching the stack below
        lo, hi = jnp.tile(gmin, (G, 1, 1)), jnp.tile(gmax, (G, 1, 1))
    if mesh_ctx is not None:
        from ..parallel.mesh import replicate

        variables = replicate(variables, mesh_ctx)
        batch_sh = mesh_ctx.sharding(mesh_ctx.batch_axis)
        if imagewise:
            lo, hi = (jax.device_put(v, batch_sh) for v in (lo, hi))

    def dispatch(gi):
        group = starts[gi:gi + G]
        # f0 = w0 - H keeps every window's stride-2 downsampling grids
        # anchored like the full-song run (W and H are multiples of the
        # total stride, asserted above); the last window's slice runs
        # past the song end and pads exactly like the bucketed path
        # (reflect at the true end, then zeros), so the final frames
        # carry the same end-halo semantics the evaluation path has.
        xp = jnp if isinstance(audio, jnp.ndarray) else np
        aa = xp.stack([_frame_slice_audio(
            audio, max(0, w0 - H), max(0, w0 - H) + span, span)
            for w0 in group]).reshape(G * B, -1)
        if mesh_ctx is not None:
            aa = jax.device_put(aa, batch_sh)
        rolls = window(variables, aa, lo, hi)
        if mesh_ctx is None:  # sharded arrays fetch on consume instead
            jax.tree_util.tree_map(lambda r: r.copy_to_host_async(), rolls)
        return gi, group, rolls

    out = None
    depth = max(1, int(pipeline_depth))
    pending, nxt = [], 0
    while nxt < len(starts) or pending:
        while nxt < len(starts) and len(pending) < depth:
            pending.append(dispatch(nxt))
            nxt += G
        gi, group, rolls = pending.pop(0)
        rolls = jax.tree_util.tree_map(
            lambda r: np.asarray(r, np.float32).reshape(
                (G, B) + r.shape[1:]), rolls)
        if out is None:
            out = jax.tree_util.tree_map(
                lambda r: np.zeros((B, t_true) + r.shape[3:], np.float32),
                rolls)
        for i, w0 in enumerate(group):
            if gi + i >= n_real:
                break
            w1, f0 = min(t_true, w0 + W), max(0, w0 - H)
            jax.tree_util.tree_map(
                lambda dst, r: dst.__setitem__(
                    (slice(None), slice(w0, w1)),
                    r[i][:, w0 - f0:w1 - f0]),
                out, rolls)
    return jax.tree_util.tree_map(jnp.asarray, out)
