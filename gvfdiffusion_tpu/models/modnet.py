"""MODNet — trimap-free matting (the reference's background-removal model).

The reference drives MODNet through an external checkout
(scripts/inference_MODNet.py:12 `from src.models.modnet import MODNet`,
inference at :58-103: resize to ref_size=512 multiples of 32, normalize to
[-1,1], take the fused matte). This is a TPU-native flax implementation of
the published MODNet design (Ke et al., AAAI 2022): a MobileNetV2 encoder
with three decomposed objectives —

  LR branch      semantic estimate from enc32x (SE-gated, predicted at 1/8)
  HR branch      boundary detail from enc2x/enc4x + downscaled images
  Fusion branch  semantic + detail -> full-res matte

Produces the `matting_fn` the TRELLIS pipeline and process_video accept
(pipelines/trellis_image_to_3d.py:60, scripts/process_video.py:86).
NHWC layout, static shapes; every stage is jit-compiled once per size.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear")


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    feature_group_count=self.groups, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu6(x) if self.act else x


class InvertedResidual(nn.Module):
    """MobileNetV2 block: 1x1 expand -> 3x3 depthwise -> 1x1 project."""

    features: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = inp * self.expand
        h = x
        if self.expand != 1:
            h = ConvBNReLU(hidden, kernel=1)(h, train)
        h = ConvBNReLU(hidden, kernel=3, stride=self.stride, groups=hidden)(h, train)
        h = ConvBNReLU(self.features, kernel=1, act=False)(h, train)
        if self.stride == 1 and inp == self.features:
            h = x + h
        return h


class MobileNetV2Encoder(nn.Module):
    """Standard MobileNetV2 trunk returning the three MODNet taps:
    enc2x (stride 2), enc4x (stride 4), enc32x (stride 32)."""

    width: float = 1.0
    # (expand, channels, repeats, stride) — the published configuration
    cfg: Sequence[Tuple[int, int, int, int]] = (
        (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
        (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
    )

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda ch: max(8, int(ch * self.width))
        h = ConvBNReLU(c(32), kernel=3, stride=2)(x, train)
        taps = {}
        for si, (expand, ch, reps, stride) in enumerate(self.cfg):
            for i in range(reps):
                s = stride if i == 0 else 1
                h = InvertedResidual(c(ch), s, expand)(h, train)
            # Official MODNet MobileNetV2Backbone split: enc2x is
            # features[0:2] (stem conv + the 16-channel block), enc4x is
            # features[2:4] (the FULL 24-channel stage) — matching the
            # published checkpoint's tohr_enc2x/enc4x input widths.
            if si == 0:
                taps["enc2x"] = h
            elif si == 1:
                taps["enc4x"] = h
        h = ConvBNReLU(c(1280), kernel=1)(h, train)
        return taps["enc2x"], taps["enc4x"], h


class SEBlock(nn.Module):
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = jnp.mean(x, axis=(1, 2))
        w = nn.relu(nn.Dense(max(1, c // self.reduction))(w))
        w = jax.nn.sigmoid(nn.Dense(c)(w))
        return x * w[:, None, None, :]


class MODNet(nn.Module):
    """Returns (semantic [B,h/8,w/8,1], detail [B,H,W,1], matte [B,H,W,1]),
    all sigmoid-activated, input in [-1, 1]."""

    hr_channels: int = 32
    backbone_width: float = 1.0

    @nn.compact
    def __call__(self, img, train: bool = False):
        b, H, W, _ = img.shape
        img2x = _resize(img, H // 2, W // 2)
        img4x = _resize(img, H // 4, W // 4)

        enc2x, enc4x, enc32x = MobileNetV2Encoder(
            width=self.backbone_width, name="backbone")(img, train)

        # -- LR (semantic) branch --
        lr = SEBlock(name="se")(enc32x)
        lr16x = _resize(lr, H // 16, W // 16)
        lr16x = ConvBNReLU(self.hr_channels * 2, kernel=5, name="conv_lr16x")(lr16x, train)
        lr8x = _resize(lr16x, H // 8, W // 8)
        lr8x = ConvBNReLU(self.hr_channels, kernel=5, name="conv_lr8x")(lr8x, train)
        semantic = jax.nn.sigmoid(
            nn.Conv(1, (3, 3), name="conv_lr")(lr8x))

        # -- HR (detail) branch --
        tohr_enc2x = ConvBNReLU(self.hr_channels, kernel=1, name="tohr_enc2x")(enc2x, train)
        hr2x_in = ConvBNReLU(
            self.hr_channels, kernel=3,
            name="conv_enc2x")(jnp.concatenate([img2x, tohr_enc2x], -1), train)
        tohr_enc4x = ConvBNReLU(self.hr_channels, kernel=1, name="tohr_enc4x")(enc4x, train)
        hr4x = ConvBNReLU(
            self.hr_channels * 2, kernel=3,
            name="conv_enc4x")(jnp.concatenate([_resize(hr2x_in, H // 4, W // 4),
                                                tohr_enc4x], -1), train)
        lr4x = _resize(lr8x, H // 4, W // 4)
        hr4x = ConvBNReLU(
            self.hr_channels * 2, kernel=3,
            name="conv_hr4x")(jnp.concatenate([hr4x, lr4x, img4x], -1), train)
        hr2x = _resize(hr4x, H // 2, W // 2)
        hr2x = ConvBNReLU(
            self.hr_channels, kernel=3,
            name="conv_hr2x")(jnp.concatenate([hr2x, hr2x_in], -1), train)
        detail_feat = _resize(hr2x, H, W)
        detail_feat = ConvBNReLU(
            self.hr_channels, kernel=3,
            name="conv_hr")(jnp.concatenate([detail_feat, img], -1), train)
        detail = jax.nn.sigmoid(nn.Conv(1, (1, 1), name="conv_hr_out")(detail_feat))

        # -- fusion branch --
        lr2x = _resize(lr8x, H // 2, W // 2)
        f2x = ConvBNReLU(
            self.hr_channels, kernel=3,
            name="conv_f2x")(jnp.concatenate([lr2x, hr2x], -1), train)
        f = _resize(f2x, H, W)
        f = ConvBNReLU(
            max(self.hr_channels // 2, 8), kernel=3,
            name="conv_f")(jnp.concatenate([f, img], -1), train)
        matte = jax.nn.sigmoid(nn.Conv(1, (1, 1), name="conv_f_out")(f))
        return semantic, detail, matte


def preprocess_size(h: int, w: int, ref_size: int = 512) -> Tuple[int, int]:
    """The reference inference script's sizing rule
    (scripts/inference_MODNet.py:62-80): scale so the short side is near
    ref_size (only if outside [ref, 2*ref] or smaller), then snap both sides
    down to multiples of 32."""
    if max(h, w) < ref_size or min(h, w) > ref_size:
        if w >= h:
            rh = ref_size
            rw = int(w / h * ref_size)
        else:
            rw = ref_size
            rh = int(h / w * ref_size)
    else:
        rh, rw = h, w
    return rh - rh % 32, rw - rw % 32


def make_matting_fn(model: MODNet, params, ref_size: int = 512) -> Callable:
    """Build the `matting_fn(img [H,W,3] in [0,1]) -> alpha [H,W]` hook the
    pipelines accept. Compiles once per distinct input size."""
    cache = {}

    def run(x):
        _, _, matte = model.apply(params, x)
        return matte

    def matting_fn(img: np.ndarray) -> np.ndarray:
        img = np.asarray(img, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        h, w = img.shape[:2]
        rh, rw = preprocess_size(h, w, ref_size)
        key = (rh, rw)
        if key not in cache:
            cache[key] = jax.jit(run)
        x = jax.image.resize(jnp.asarray(img[None]), (1, rh, rw, 3), "bilinear")
        matte = cache[key](x * 2.0 - 1.0)
        matte = jax.image.resize(matte, (1, h, w, 1), "bilinear")
        return np.clip(np.asarray(matte)[0, :, :, 0], 0.0, 1.0)

    return matting_fn
