"""ESResNe(X)t / FBSP audio encoders — TPU rebuild of the reference's
resnext.py (captioning/models/resnext.py, 1012 LoC), the last
wholly-absent encoder family of round 1.

The family is an ImageNet-style ResNe(X)t-50 applied to a 3-band
spectrogram image:

  waveform (int16 value range) --scale--> [-1, 1]
    --spectrogram--> [B, F, T, (re,im)]          (resnext.py:635-650)
    --split into 3 frequency bands-->            (:652-659)
    --power + bilinear resize to 224x224 (align_corners)--> (:661-675)
    --10*log10--> 3-channel dB image             (:677-692)
    --ResNeXt-50 (groups 32, width 4) w/ optional Attention2d gates-->
    --avgpool --> fc                             (:250-478)

The FBSP variants replace the fixed STFT with a LEARNABLE frequency
B-spline wavelet filterbank (LinearFBSP, :787-890): complex filters
materialized from three per-bin parameters (order m, bandwidth fb,
center frequency fc), applied to boxcar-windowed signal frames
(frame_signal, :39-81).

Faithfulness notes:
  * torch.stft(center=True, reflect pad, onesided) is reproduced with a
    framing matmul DFT (MXU-friendly; no torchaudio).  (The reference's
    own non-FBSP path no longer runs on torch>=2 — it calls torch.stft
    without return_complex — so only the FBSP path has a runnable torch
    oracle.)
  * bilinear resize uses align_corners=True semantics (F.interpolate
    align_corners=True), implemented explicitly — jax.image.resize has
    no align_corners mode.
  * the reference registers grad hooks normalizing m/fb/fc grads by
    their inf-norm (:813-815); training code can apply the equivalent
    optax transform, the forward is unaffected.
  * ESResNeXt loss adds an FBSP-weights norm regularizer (:927-939),
    exposed here as ``fbsp_norm_loss``.

``ESResNeXtFBSPEncoder`` adapts the trunk to the captioning encoder
contract (our wiring; the reference never connected resnext.py to the
caption models).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiocaption_tpu.models import convert
from audiocaption_tpu.models.layers import BatchNorm
from audiocaption_tpu.ops.masking import mean_with_lens

Array = jnp.ndarray


# --------------------------------------------------------------------------
# Signal helpers
# --------------------------------------------------------------------------

def scale_value_range(x: Array, old_min: float, old_max: float,
                      new_min: float, new_max: float) -> Array:
    """resnext.py:31-36."""
    old_range = old_max - old_min
    new_range = new_max - new_min
    return new_min + (x - old_min) * new_range / old_range


def frame_signal(signal: Array, frame_length: int, hop_length: int,
                 window: Optional[np.ndarray] = None) -> Array:
    """[N, T] -> [N, num_frames, frame_length] with the reference's
    centered zero padding (resnext.py:39-81)."""
    N, T = signal.shape
    if T <= frame_length:
        num_frames = 1
    else:
        num_frames = 1 + int(math.ceil((T - frame_length) / hop_length))
    pad_len = (num_frames - 1) * hop_length + frame_length
    if pad_len > T:
        extra = pad_len - T
        signal = jnp.pad(signal, ((0, 0), (extra // 2, extra - extra // 2)))
    starts = np.arange(num_frames) * hop_length
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    frames = signal[:, idx]                         # [N, F, frame_length]
    if window is not None:
        frames = frames * jnp.asarray(window, frames.dtype)
    return frames


def stft_realimag(x: Array, n_fft: int, hop_length: int, win_length: int,
                  window: np.ndarray, normalized: bool = False) -> Array:
    """torch.stft(center=True, pad_mode='reflect', onesided) as framing +
    DFT matmuls: [N, T] -> [N, n_fft//2+1, frames, 2]."""
    N, T = x.shape
    x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    if win_length < n_fft:
        pad = n_fft - win_length
        window = np.pad(window, (pad // 2, pad - pad // 2))
    frames_count = 1 + (x.shape[1] - n_fft) // hop_length
    starts = np.arange(frames_count) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    frames = x[:, idx] * jnp.asarray(window, x.dtype)  # [N, Fr, n_fft]
    k = np.arange(n_fft // 2 + 1)
    t = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(t, k) / n_fft
    cos_b = jnp.asarray(np.cos(ang), jnp.float32)      # [n_fft, F]
    sin_b = jnp.asarray(-np.sin(ang), jnp.float32)
    re = frames @ cos_b                                # [N, Fr, F]
    im = frames @ sin_b
    if normalized:
        re = re / math.sqrt(n_fft)
        im = im / math.sqrt(n_fft)
    spec = jnp.stack([re, im], axis=-1)                # [N, Fr, F, 2]
    return jnp.transpose(spec, (0, 2, 1, 3))           # [N, F, Fr, 2]


def resize_bilinear_align_corners(x: Array, out_h: int, out_w: int) -> Array:
    """F.interpolate(mode='bilinear', align_corners=True) over the last
    two axes of [..., H, W]."""
    H, W = x.shape[-2], x.shape[-1]

    def axis_weights(n_in, n_out):
        if n_out == 1 or n_in == 1:
            src = np.zeros(n_out)
        else:
            src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        w_hi = src - lo
        m = np.zeros((n_in, n_out), np.float32)
        m[lo, np.arange(n_out)] += 1.0 - w_hi
        m[hi, np.arange(n_out)] += w_hi
        return jnp.asarray(m)

    mh = axis_weights(H, out_h)                        # [H, out_h]
    mw = axis_weights(W, out_w)                        # [W, out_w]
    x = jnp.einsum("...hw,hi->...iw", x, mh)
    return jnp.einsum("...iw,wj->...ij", x, mw)


# --------------------------------------------------------------------------
# LinearFBSP — learnable frequency B-spline filterbank (resnext.py:787-890)
# --------------------------------------------------------------------------

class LinearFBSP(nn.Module):
    out_features: int
    normalized: bool = False
    use_bias: bool = False
    eps: float = 1e-8

    def setup(self):
        F = self.out_features
        self.m = self.param("m", nn.initializers.zeros, (F,))
        self.fb = self.param("fb", nn.initializers.ones, (F,))
        self.fc = self.param("fc",
                             lambda k: jnp.arange(F, dtype=jnp.float32))
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.normal(0.5),
                                   (F, 2))

    @staticmethod
    def _complex_power(x_re, x_im, p_re):
        """(x)^(p_re) for complex x, real power (resnext.py:817-830 with
        power_imag == 0, the only case the model uses)."""
        mag2 = x_re ** 2 + x_im ** 2
        phase = jnp.arctan2(x_im, x_re)
        mag_out = mag2 ** (0.5 * p_re)
        ang = p_re * phase
        return mag_out * jnp.cos(ang), mag_out * jnp.sin(ang)

    def materialize_weights(self, in_features: int) -> Tuple[Array, Array]:
        """-> (W_re, W_im) each [out_features, in_features]
        (resnext.py:835-861)."""
        t = (np.pi * jnp.linspace(-1.0, 1.0, in_features)[None, :]
             + self.eps)                               # [1, in]
        m = self.m[:, None]
        fb = self.fb[:, None]
        fc = self.fc[:, None]
        kern_re = jnp.cos(fc * t)
        kern_im = -jnp.sin(fc * t)
        scale = jnp.sqrt(fb)
        z = fb * t / (m + self.eps)
        win = jnp.where(z == 0, jnp.ones_like(z), jnp.sin(z) / z)
        win_re, win_im = self._complex_power(win, jnp.zeros_like(win), m)
        w_re = scale * (win_re * kern_re - win_im * kern_im)
        w_im = scale * (win_re * kern_im + win_im * kern_re)
        if self.normalized:
            w_re = w_re / math.sqrt(in_features)
            w_im = w_im / math.sqrt(in_features)
        return w_re, w_im

    def __call__(self, frames: Array) -> Tuple[Array, Tuple[Array, Array]]:
        """frames [N, Fr, L] real -> spec [N, Fr, out, 2]."""
        w_re, w_im = self.materialize_weights(frames.shape[-1])
        re = frames @ w_re.T
        im = frames @ w_im.T
        spec = jnp.stack([re, im], axis=-1)
        if self.use_bias:
            spec = spec + self.bias
        return spec, (w_re, w_im)


def fbsp_norm_loss(w_re: Array, w_im: Array, n_fft: int,
                   normalized: bool = False) -> Array:
    """FBSP filter-norm regularizer (resnext.py:927-939)."""
    norm = jnp.sqrt(jnp.sum(w_re ** 2 + w_im ** 2, axis=-1))
    target = 1.0 if normalized else math.sqrt(n_fft)
    return jnp.mean((norm - target) ** 2)


# --------------------------------------------------------------------------
# ResNeXt trunk (NHWC)
# --------------------------------------------------------------------------

class Bottleneck(nn.Module):
    """torchvision Bottleneck (resnext.py:160-211), expansion 4."""
    planes: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        out = BatchNorm(name="bn1")(out, train=train)
        out = nn.relu(out)
        out = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      feature_group_count=self.groups, name="conv2")(out)
        out = BatchNorm(name="bn2")(out, train=train)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = BatchNorm(name="bn3")(out, train=train)
        if self.has_downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            identity = BatchNorm(name="downsample_bn")(identity,
                                                       train=train)
        else:
            identity = x
        return nn.relu(out + identity)


def _adaptive_max_pool(x: Array, out_hw: Tuple[int, int]) -> Array:
    """adaptive_max_pool2d for evenly divisible sizes (all sizes in this
    model divide evenly; asserted)."""
    H, W = x.shape[1], x.shape[2]
    oh, ow = out_hw
    assert H % oh == 0 and W % ow == 0, (H, W, oh, ow)
    kh, kw = H // oh, W // ow
    return nn.max_pool(x, (kh, kw), strides=(kh, kw))


class Attention2d(nn.Module):
    """Attention gate (resnext.py:214-247): adaptive max pool to the
    gated feature's size -> depthwise conv -> pointwise conv -> BN ->
    sigmoid."""
    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    padding_size: Tuple[int, int]

    @nn.compact
    def __call__(self, x: Array, out_hw: Tuple[int, int],
                 train: bool = False) -> Array:
        x = _adaptive_max_pool(x, out_hw)
        x = nn.Conv(self.in_channels, self.kernel_size,
                    padding=(tuple([self.padding_size[0]] * 2),
                             tuple([self.padding_size[1]] * 2)),
                    feature_group_count=self.in_channels,
                    name="conv_depth")(x)
        x = nn.Conv(self.out_channels, (1, 1), name="conv_point")(x)
        x = BatchNorm(name="bn")(x, train=train)
        return jax.nn.sigmoid(x)


class ResNeXtTrunk(nn.Module):
    """conv1 -> 4 bottleneck stages (+ optional attention gates) ->
    avgpool (resnext.py:250-478)."""
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    groups: int = 32
    width_per_group: int = 4
    apply_attention: bool = False
    num_classes: int = 527

    def setup(self):
        self.conv1 = nn.Conv(64, (7, 7), strides=(2, 2),
                             padding=((3, 3), (3, 3)), use_bias=False,
                             name="conv1")
        self.bn1 = BatchNorm(name="bn1")
        blocks = []
        inplanes = 64
        for stage, (planes, n, stride) in enumerate(
                zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2))):
            stage_blocks = []
            for i in range(n):
                s = stride if i == 0 else 1
                ds = i == 0 and (s != 1 or inplanes != planes * 4)
                stage_blocks.append(Bottleneck(
                    planes=planes, stride=s, groups=self.groups,
                    base_width=self.width_per_group, has_downsample=ds,
                    name=f"layer{stage + 1}_{i}"))
                inplanes = planes * 4
            blocks.append(stage_blocks)
        self.stages = blocks
        if self.apply_attention:
            self.att1 = Attention2d(64, 256, (3, 1), (1, 0), name="att1")
            self.att2 = Attention2d(256, 512, (1, 5), (0, 2), name="att2")
            self.att3 = Attention2d(512, 1024, (3, 1), (1, 0),
                                    name="att3")
            self.att4 = Attention2d(1024, 2048, (1, 5), (0, 2),
                                    name="att4")
            self.att5 = Attention2d(2048, 2048, (3, 5), (1, 2),
                                    name="att5")
        self.fc = nn.Dense(self.num_classes, name="fc")

    def pre_features(self, x: Array, train: bool = False) -> Array:
        x = nn.relu(self.bn1(self.conv1(x), train=train))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        return nn.max_pool(x, (3, 3), strides=(2, 2))

    def features(self, x: Array, train: bool = False) -> Array:
        x = self.pre_features(x, train=train)
        atts = ((self.att1, self.att2, self.att3, self.att4)
                if self.apply_attention else (None,) * 4)
        for stage_blocks, att in zip(self.stages, atts):
            x_in = x
            for blk in stage_blocks:
                x = blk(x, train=train)
            if att is not None:
                x = x * att(x_in, (x.shape[1], x.shape[2]), train=train)
        return x

    def reduce(self, x: Array, train: bool = False) -> Array:
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        if self.apply_attention:
            pooled = pooled * self.att5(x, (1, 1), train=train)
        return pooled[:, 0, 0, :]

    def __call__(self, x: Array, train: bool = False) -> Array:
        return self.fc(self.reduce(self.features(x, train=train),
                                   train=train))


# --------------------------------------------------------------------------
# Full models
# --------------------------------------------------------------------------

class ESResNeXtFBSP(nn.Module):
    """ESResNeXtFBSP classifier (resnext.py:977-1012): learnable FBSP
    frontend + 3-band dB image + ResNeXt-50 (groups 32, width 4).
    Defaults mirror the reference constructor (:506-533: n_fft 256,
    hop n_fft//4, win n_fft, boxcar window, unnormalized); the public
    AudioSet checkpoints use n_fft 2048 / win 1654 / hop 561 /
    blackmanharris / normalized / apply_attention."""
    n_fft: int = 256
    hop_length: Optional[int] = None
    win_length: Optional[int] = None
    window: str = "boxcar"
    normalized: bool = False
    onesided: bool = True
    spec_height: int = 224
    spec_width: int = 224
    num_classes: int = 1000
    apply_attention: bool = False
    log10_eps: float = 1e-18

    @property
    def _hop(self) -> int:
        return (self.hop_length if self.hop_length is not None
                else int(np.floor(self.n_fft / 4)))

    @property
    def _win_len(self) -> int:
        return (self.win_length if self.win_length is not None
                else self.n_fft)

    def setup(self):
        import scipy.signal as sps
        self._win = sps.get_window(self.window, self._win_len,
                                   fftbins=True).astype(np.float32)
        out_f = (self.n_fft // 2 + 1) if self.onesided else self.n_fft
        self.fbsp = LinearFBSP(out_features=out_f,
                               normalized=self.normalized,
                               use_bias=False, name="fbsp")
        self.trunk = ResNeXtTrunk(apply_attention=self.apply_attention,
                                  num_classes=self.num_classes,
                                  name="trunk")

    def spectrogram(self, x: Array) -> Tuple[Array, Tuple[Array, Array]]:
        """FBSP spectrogram (resnext.py:905-925): boxcar-windowed frames
        (zero-padded to n_fft) through the learned filterbank ->
        [N, F, Fr, 2]."""
        frames = frame_signal(x, self._win_len, self._hop, self._win)
        if self.n_fft > self._win_len:
            pad = self.n_fft - self._win_len
            frames = jnp.pad(frames,
                             ((0, 0), (0, 0), (pad // 2, pad - pad // 2)))
        spec, w = self.fbsp(frames)                   # [N, Fr, F, 2]
        return jnp.transpose(spec, (0, 2, 1, 3)), w

    def db_image(self, wav: Array) -> Tuple[Array, Tuple[Array, Array]]:
        """waveform (int16 range) -> [B, H, W, 3] dB image
        (resnext.py:652-692)."""
        x = scale_value_range(wav, -32768.0, 32767.0, -1.0, 1.0)
        spec, w = self.spectrogram(x)                 # [B, F, Fr, 2]
        F3 = (spec.shape[1] // 3) * 3
        spec = spec[:, :F3]
        B = spec.shape[0]
        spec = spec.reshape(B, 3, F3 // 3, spec.shape[2], 2)
        pow_spec = spec[..., 0] ** 2 + spec[..., 1] ** 2
        pow_spec = resize_bilinear_align_corners(
            pow_spec, self.spec_height, self.spec_width)
        pow_spec = jnp.where(pow_spec > 0.0, pow_spec, self.log10_eps)
        x_db = 10.0 * jnp.log10(pow_spec)             # [B, 3, H, W]
        return jnp.transpose(x_db, (0, 2, 3, 1)), w

    def __call__(self, wav: Array, train: bool = False) -> Array:
        img, _ = self.db_image(wav)
        return self.trunk(img, train=train)


class ESResNeXtFBSPEncoder(nn.Module):
    """Captioning-encoder adapter: trunk layer4 features pooled over
    frequency become the temporal attn_emb [B, W/32, 2048]."""
    fbsp_model: ESResNeXtFBSP

    @nn.compact
    def __call__(self, wav: Array, wav_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        m = self.fbsp_model
        img, _ = m.db_image(wav * 32767.0)            # [-1,1] -> int16
        feats = m.trunk.features(img, train=train)    # [B, h, w, 2048]
        attn_emb = jnp.mean(feats, axis=1)            # [B, w, 2048]
        # the spectrogram is resized to a fixed width, so every clip
        # maps to the full w patches
        attn_emb_len = jnp.full((wav.shape[0],), attn_emb.shape[1],
                                jnp.int32)
        fc_emb = jnp.mean(attn_emb, axis=1)
        return {"fc_emb": fc_emb, "attn_emb": attn_emb,
                "attn_emb_len": attn_emb_len}


# --------------------------------------------------------------------------
# Checkpoint conversion
# --------------------------------------------------------------------------

def convert_esresnext(sd: Dict[str, np.ndarray],
                      layers: Tuple[int, ...] = (3, 4, 6, 3),
                      apply_attention: bool = True,
                      fbsp: bool = True,
                      prefix: str = "") -> Tuple[Dict, Dict]:
    """torch ESResNeXt(FBSP) state_dict -> (params, batch_stats)."""
    k = lambda name: f"{prefix}.{name}" if prefix else name
    t_params: Dict[str, Any] = {}
    t_stats: Dict[str, Any] = {}

    def put_bn(tree, stats, name, key):
        p, s = convert.batchnorm(sd, k(key))
        tree[name] = p
        stats[name] = s

    t_params["conv1"] = convert.conv2d(sd, k("conv1"))
    put_bn(t_params, t_stats, "bn1", "bn1")
    for stage, n in enumerate(layers, 1):
        for i in range(n):
            b = f"layer{stage}.{i}"
            blk: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = convert.conv2d(sd, k(f"{b}.conv{ci}"))
                put_bn(blk, blk_s, f"bn{ci}", f"{b}.bn{ci}")
            if k(f"{b}.downsample.0.weight") in sd:
                blk["downsample_conv"] = convert.conv2d(
                    sd, k(f"{b}.downsample.0"))
                put_bn(blk, blk_s, "downsample_bn", f"{b}.downsample.1")
            t_params[f"layer{stage}_{i}"] = blk
            t_stats[f"layer{stage}_{i}"] = blk_s
    if apply_attention:
        for a in ("att1", "att2", "att3", "att4", "att5"):
            ap: Dict[str, Any] = {
                "conv_depth": convert.conv2d(sd, k(f"{a}.conv_depth"),
                                             bias=True),
                "conv_point": convert.conv2d(sd, k(f"{a}.conv_point"),
                                             bias=True),
            }
            as_: Dict[str, Any] = {}
            put_bn(ap, as_, "bn", f"{a}.bn")
            t_params[a] = ap
            t_stats[a] = as_
    t_params["fc"] = convert.linear(sd, k("fc"))

    params: Dict[str, Any] = {"trunk": t_params}
    stats: Dict[str, Any] = {"trunk": t_stats}
    if fbsp:
        params["fbsp"] = {"m": sd[k("fbsp.m")], "fb": sd[k("fbsp.fb")],
                          "fc": sd[k("fbsp.fc")]}
    return params, stats
