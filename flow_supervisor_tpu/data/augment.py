"""Host-side (numpy/cv2) augmentors.

Semantics parity with the reference (``raft_utils/augmentor.py``):

- ``ColorJitter``: brightness multiply U(1-b, 1+b); TF-style contrast
  ((x - per-channel spatial mean) * c + mean); saturation scale in HSV; additive
  hue rotation — clipped to [0, 1] afterwards.
- ``FlowAugmentor`` (dense): asymmetric-color prob 0.2; eraser occlusion prob 0.5
  with 1-2 rectangles 50-100 px filled with img2's mean color; spatial scale
  2^U(min,max) with stretch prob 0.8 (+-0.2 exponents), floored to
  (crop+8)/size; spatial prob 0.8; h-flip 0.5 / v-flip 0.1; random crop.
- ``SparseFlowAugmentor``: same but symmetric-only color and nearest-neighbor
  flow/valid resize (augmentor.py:256-266).
- ``UnsupAugmentor`` (the unsup/semi workhorse, augmentor.py:501-662): keeps BOTH
  a full-size frame (floor-multiple-of-8 crop of the possibly-rescaled pair) AND
  an 8-ALIGNED random crop with offsets; color + eraser applied only to the crop,
  eraser on img2 only; returns the dict contract consumed by semi training.

TPU-first deviation: when ``full_size`` is fixed (per-stage static shapes for
XLA), sources smaller than full_size are upscaled first so every example yields
exactly (full_h, full_w) — the reference instead lets full frames vary per
dataset (dynamic shapes, fine for TF, hostile to XLA).

All randomness flows through an explicit ``np.random.Generator``.
"""
from __future__ import annotations

import numpy as np

try:
    import cv2

    cv2.setNumThreads(0)
    cv2.ocl.setUseOpenCL(False)
except Exception:  # pragma: no cover
    cv2 = None


def _resize(img: np.ndarray, h: int, w: int, nearest: bool = False) -> np.ndarray:
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    out = cv2.resize(img, (w, h), interpolation=interp)
    if out.ndim == 2:
        out = out[:, :, None]
    return out


def _rgb_to_hsv(rgb: np.ndarray) -> np.ndarray:
    maxc = rgb.max(-1)
    minc = rgb.min(-1)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-12), 0.0)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    dz = np.maximum(delta, 1e-12)
    h = np.where(
        maxc == r, (g - b) / dz, np.where(maxc == g, 2.0 + (b - r) / dz, 4.0 + (r - g) / dz)
    )
    h = (h / 6.0) % 1.0
    h = np.where(delta == 0, 0.0, h)
    return np.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(np.int32) % 6
    out = np.zeros(hsv.shape, hsv.dtype)
    tables = [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)]
    for idx, (r, g, b) in enumerate(tables):
        m = i == idx
        out[..., 0] = np.where(m, r, out[..., 0])
        out[..., 1] = np.where(m, g, out[..., 1])
        out[..., 2] = np.where(m, b, out[..., 2])
    return out


class ColorJitter:
    def __init__(self, brightness, contrast, saturation, hue):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def __call__(self, im: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        b = rng.uniform(max(0.0, 1.0 - self.brightness), 1.0 + self.brightness)
        c = rng.uniform(max(0.0, 1.0 - self.contrast), 1.0 + self.contrast)
        # brightness then contrast-about-the-mean, fused to ONE image pass:
        # ((im*b) - mean(im*b))*c + mean(im*b) == im*(b*c) + b*mean(im)*(1-c)
        mean = im.reshape(-1, im.shape[-1]).mean(axis=0)
        im = im * np.float32(b * c) + (mean * (b * (1.0 - c))).astype(np.float32)
        s = rng.uniform(max(0.0, 1.0 - self.saturation), 1.0 + self.saturation)
        d = rng.uniform(-self.hue, self.hue)
        # cv2's SIMD HSV round-trip (float32: H in [0,360), S/V in [0,1]) —
        # the numpy formulation cost ~155 ms/example at full-frame sizes and
        # dominated the whole loader (same standard HSV model, so identical
        # up to fp rounding)
        hsv = cv2.cvtColor(np.clip(im, 0.0, 1.0).astype(np.float32), cv2.COLOR_RGB2HSV)
        hsv[..., 1] = np.clip(hsv[..., 1] * s, 0.0, 1.0)
        hsv[..., 0] = (hsv[..., 0] + d * 360.0) % 360.0
        return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def _eraser(img2: np.ndarray, rng: np.random.Generator, prob: float, bounds=(50, 100)):
    ht, wd = img2.shape[:2]
    if rng.uniform() < prob:
        mean_color = img2.reshape(-1, 3).mean(axis=0)
        for _ in range(rng.integers(1, 3)):
            x0 = int(rng.integers(0, wd))
            y0 = int(rng.integers(0, ht))
            dx = int(rng.integers(min(bounds[0], wd - x0), min(bounds[1], wd - x0 + 1)))
            dy = int(rng.integers(min(bounds[0], ht - y0), min(bounds[1], ht - y0 + 1)))
            img2 = img2.copy()
            img2[y0 : y0 + dy, x0 : x0 + dx] = mean_color
    return img2


class FlowAugmentor:
    """Dense augmentor."""

    sparse = False

    def __init__(
        self,
        crop_size,
        min_scale=-0.2,
        max_scale=0.5,
        do_flip=True,
        eraser_aug_prob=0.5,
        do_rotation=False,
        max_rotation=10.0,
    ):
        self.crop_size = tuple(crop_size)
        self.min_scale = min_scale
        self.max_scale = max_scale
        # flow-aware rotation (reference augmentor.py:54-55,116-117; off by
        # default there too, enabled via --do_rotation)
        self.do_rotation = do_rotation
        self.max_rotation = max_rotation
        self.spatial_aug_prob = 0.8
        self.stretch_prob = 0.8
        self.max_stretch = 0.2
        self.do_flip = do_flip
        self.h_flip_prob = 0.5
        self.v_flip_prob = 0.1
        self.asymmetric_color_aug_prob = 0.2
        self.eraser_aug_prob = eraser_aug_prob
        self.photo_aug = ColorJitter(0.4, 0.4, 0.4, 0.5 / 3.14)

    def color_transform(self, img1, img2, rng):
        if rng.uniform() < self.asymmetric_color_aug_prob:
            img1 = self.photo_aug(img1, rng)
            img2 = self.photo_aug(img2, rng)
        else:
            stack = self.photo_aug(np.concatenate([img1, img2], axis=0), rng)
            img1, img2 = np.split(stack, 2, axis=0)
        return np.clip(img1, 0.0, 1.0), np.clip(img2, 0.0, 1.0)

    def _sample_scales(self, rng, base_h, base_w):
        min_scale = max(
            (self.crop_size[0] + 8.0) / base_h, (self.crop_size[1] + 8.0) / base_w
        )
        scale = 2.0 ** rng.uniform(self.min_scale, self.max_scale)
        sx = sy = scale
        if rng.uniform() < self.stretch_prob:
            sx *= 2.0 ** rng.uniform(-self.max_stretch, self.max_stretch)
            sy *= 2.0 ** rng.uniform(-self.max_stretch, self.max_stretch)
        return max(sx, min_scale), max(sy, min_scale), min_scale

    def spatial_transform(self, img1, img2, flow, rng):
        if self.do_rotation:
            (img1, img2), flow, _ = random_rotation(
                [img1, img2], flow, np.ones_like(flow[..., :1]),
                self.max_rotation, rng,
            )
        ht, wd = img1.shape[:2]
        sx, sy, min_scale = self._sample_scales(rng, ht, wd)
        if rng.uniform() < self.spatial_aug_prob:
            t_h, t_w = int(round(ht * sy)), int(round(wd * sx))
            sy, sx = t_h / ht, t_w / wd
            img1 = _resize(img1, t_h, t_w)
            img2 = _resize(img2, t_h, t_w)
            flow = _resize(flow, t_h, t_w) * np.asarray([sx, sy], np.float32)
        elif min_scale > 1.0:
            t_h, t_w = int(round(ht * min_scale)), int(round(wd * min_scale))
            s2y, s2x = t_h / ht, t_w / wd
            img1 = _resize(img1, t_h, t_w)
            img2 = _resize(img2, t_h, t_w)
            flow = _resize(flow, t_h, t_w) * np.asarray([s2x, s2y], np.float32)

        if self.do_flip:
            if rng.uniform() < self.h_flip_prob:
                img1, img2 = img1[:, ::-1], img2[:, ::-1]
                flow = flow[:, ::-1] * np.asarray([-1.0, 1.0], np.float32)
            if rng.uniform() < self.v_flip_prob:
                img1, img2 = img1[::-1], img2[::-1]
                flow = flow[::-1] * np.asarray([1.0, -1.0], np.float32)

        ht, wd = img1.shape[:2]
        y0 = int(rng.integers(0, ht - self.crop_size[0]))
        x0 = int(rng.integers(0, wd - self.crop_size[1]))
        sl = np.s_[y0 : y0 + self.crop_size[0], x0 : x0 + self.crop_size[1]]
        return (
            np.ascontiguousarray(img1[sl]),
            np.ascontiguousarray(img2[sl]),
            np.ascontiguousarray(flow[sl]),
        )

    def __call__(self, img1, img2, flow, rng):
        img1, img2 = self.color_transform(img1, img2, rng)
        img2 = _eraser(img2, rng, self.eraser_aug_prob)
        img1, img2, flow = self.spatial_transform(img1, img2, flow, rng)
        return img1, img2, flow


class SparseFlowAugmentor(FlowAugmentor):
    """Sparse (KITTI) augmentor: symmetric color only, nearest flow resize."""

    sparse = True

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5, do_flip=False,
                 eraser_aug_prob=0.5, do_rotation=False, max_rotation=10.0):
        super().__init__(crop_size, min_scale, max_scale, do_flip,
                         eraser_aug_prob, do_rotation, max_rotation)
        self.photo_aug = ColorJitter(0.3, 0.3, 0.3, 0.3 / 3.14)

    def color_transform(self, img1, img2, rng):
        stack = self.photo_aug(np.concatenate([img1, img2], axis=0), rng)
        img1, img2 = np.split(stack, 2, axis=0)
        return np.clip(img1, 0.0, 1.0), np.clip(img2, 0.0, 1.0)

    def spatial_transform(self, img1, img2, flow, valid, rng):
        if self.do_rotation:
            (img1, img2), flow, valid = random_rotation(
                [img1, img2], flow, valid, self.max_rotation, rng
            )
        ht, wd = img1.shape[:2]
        sx, sy, _ = self._sample_scales(rng, ht, wd)
        if rng.uniform() < self.spatial_aug_prob:
            t_h, t_w = int(round(ht * sy)), int(round(wd * sx))
            sy, sx = t_h / ht, t_w / wd
            img1 = _resize(img1, t_h, t_w)
            img2 = _resize(img2, t_h, t_w)
            flow = _resize(flow, t_h, t_w, nearest=True) * np.asarray(
                [sx, sy], np.float32
            )
            valid = _resize(valid, t_h, t_w, nearest=True)

        if self.do_flip:
            if rng.uniform() < self.h_flip_prob:
                img1, img2 = img1[:, ::-1], img2[:, ::-1]
                flow = flow[:, ::-1] * np.asarray([-1.0, 1.0], np.float32)
                valid = valid[:, ::-1]
            if rng.uniform() < self.v_flip_prob:
                img1, img2 = img1[::-1], img2[::-1]
                flow = flow[::-1] * np.asarray([1.0, -1.0], np.float32)
                valid = valid[::-1]

        ht, wd = img1.shape[:2]
        y0 = int(rng.integers(0, ht - self.crop_size[0]))
        x0 = int(rng.integers(0, wd - self.crop_size[1]))
        sl = np.s_[y0 : y0 + self.crop_size[0], x0 : x0 + self.crop_size[1]]
        return tuple(np.ascontiguousarray(a[sl]) for a in (img1, img2, flow, valid))

    def __call__(self, img1, img2, flow, valid, rng):
        img1, img2 = self.color_transform(img1, img2, rng)
        img2 = _eraser(img2, rng, self.eraser_aug_prob)
        return self.spatial_transform(img1, img2, flow, valid, rng)


def floor_multiple(x: int, m: int = 8) -> int:
    return (x // m) * m


def random_rotation(
    images: list[np.ndarray],
    flow: np.ndarray,
    mask: np.ndarray,
    max_rotation: float,
    rng: np.random.Generator,
):
    """Flow-aware random rotation (reference ``uflow/uflow_augmentation.py:211-265``,
    used by the augmentors when do_rotation is enabled): rotates images, the
    flow FIELD, the flow VECTORS, and renormalizes by the rotated mask so border
    fill doesn't bleed into valid flow."""
    angle_deg = rng.uniform(-max_rotation, max_rotation)
    a = np.deg2rad(angle_deg)
    h, w = images[0].shape[:2]
    m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle_deg, 1.0)

    def rot(x, nearest=False):
        interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
        out = cv2.warpAffine(x, m, (w, h), flags=interp)
        if out.ndim == 2:
            out = out[:, :, None]
        return out

    images = [rot(im) for im in images]
    # mask-weighted flow rotation: rotate flow*mask and mask, renormalize
    fm = rot(flow * mask)
    mm = rot(mask)
    with np.errstate(divide="ignore", invalid="ignore"):
        flow = np.where(mm > 0, fm / np.maximum(mm, 1e-12), 0.0)
    mask = (mm > 0.999).astype(np.float32)
    # rotate the flow vectors themselves
    cos, sin = np.cos(a), np.sin(a)
    fx = cos * flow[..., 0] + sin * flow[..., 1]
    fy = -sin * flow[..., 0] + cos * flow[..., 1]
    flow = np.stack([fx, fy], axis=-1).astype(np.float32)
    return images, flow, mask


class MultiFrameAugmentor(SparseFlowAugmentor):
    """Triplet augmentor (reference augmentor.py:338-499): shared color jitter
    over 3 frames (asymmetric prob 0.2), eraser on frames 1 and 3, one spatial
    transform applied to both flows, keeps the pre-crop full frames + offsets."""

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5, do_flip=False,
                 eraser_aug_prob=0.5):
        super().__init__(crop_size, min_scale, max_scale, do_flip, eraser_aug_prob)
        self.asymmetric_color_aug_prob = 0.2

    def __call__(self, img1, img2, img3, flow1, valid1, flow2, valid2, rng):
        if rng.uniform() < self.asymmetric_color_aug_prob:
            img1 = self.photo_aug(img1, rng)
            img2 = self.photo_aug(img2, rng)
            img3 = self.photo_aug(img3, rng)
        else:
            stack = self.photo_aug(np.concatenate([img1, img2, img3], axis=0), rng)
            img1, img2, img3 = np.split(stack, 3, axis=0)
        img1, img2, img3 = (np.clip(x, 0.0, 1.0) for x in (img1, img2, img3))
        img1 = _eraser(img1, rng, self.eraser_aug_prob)
        img3 = _eraser(img3, rng, self.eraser_aug_prob)

        ht, wd = img1.shape[:2]
        sx, sy, _ = self._sample_scales(rng, ht, wd)
        f_imgs = [img1, img2, img3]
        f_flows, f_valids = [flow1, flow2], [valid1, valid2]
        if rng.uniform() < self.spatial_aug_prob:
            t_h, t_w = int(round(ht * sy)), int(round(wd * sx))
            sy, sx = t_h / ht, t_w / wd
            imgs = [_resize(x, t_h, t_w) for x in (img1, img2, img3)]
            flows = [
                _resize(f, t_h, t_w, nearest=True) * np.asarray([sx, sy], np.float32)
                for f in (flow1, flow2)
            ]
            valids = [_resize(v, t_h, t_w, nearest=True) for v in (valid1, valid2)]
            y0 = int(rng.integers(0, t_h - ht))
            x0 = int(rng.integers(0, t_w - wd))
            sl = np.s_[y0 : y0 + ht, x0 : x0 + wd]
            f_imgs = [x[sl] for x in imgs]
            f_flows = [f[sl] for f in flows]
            f_valids = [v[sl] for v in valids]
        if self.do_flip:
            if rng.uniform() < self.h_flip_prob:
                f_imgs = [x[:, ::-1] for x in f_imgs]
                f_flows = [f[:, ::-1] * np.asarray([-1.0, 1.0], np.float32) for f in f_flows]
                f_valids = [v[:, ::-1] for v in f_valids]
            if rng.uniform() < self.v_flip_prob:
                f_imgs = [x[::-1] for x in f_imgs]
                f_flows = [f[::-1] * np.asarray([1.0, -1.0], np.float32) for f in f_flows]
                f_valids = [v[::-1] for v in f_valids]

        ht, wd = f_imgs[0].shape[:2]
        y0 = int(rng.integers(0, ht - self.crop_size[0]))
        x0 = int(rng.integers(0, wd - self.crop_size[1]))
        sl = np.s_[y0 : y0 + self.crop_size[0], x0 : x0 + self.crop_size[1]]
        crops = [np.ascontiguousarray(x[sl]).astype(np.float32) for x in f_imgs]
        flows = [np.ascontiguousarray(f[sl]).astype(np.float32) for f in f_flows]
        valids = [np.ascontiguousarray(v[sl]).astype(np.float32) for v in f_valids]
        return {
            "image1": crops[0], "image2": crops[1], "image3": crops[2],
            "flow1": flows[0], "valid1": valids[0],
            "flow2": flows[1], "valid2": valids[1],
            "orig_image1": np.ascontiguousarray(f_imgs[0]).astype(np.float32),
            "orig_image2": np.ascontiguousarray(f_imgs[1]).astype(np.float32),
            "orig_image3": np.ascontiguousarray(f_imgs[2]).astype(np.float32),
            "crop_yx": np.asarray([y0, x0], np.int32),
        }


class UnsupAugmentor(SparseFlowAugmentor):
    """Full-size frame + 8-aligned crop augmentor for unsup/semi training."""

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5, do_flip=True,
                 eraser_aug_prob=0.5, full_size=None, do_rotation=False,
                 max_rotation=10.0):
        super().__init__(crop_size, min_scale, max_scale, do_flip,
                         eraser_aug_prob, do_rotation, max_rotation)
        self.full_size = tuple(full_size) if full_size is not None else None
        self.asymmetric_color_aug_prob = 0.2
        self.photo_aug = ColorJitter(0.3, 0.3, 0.3, 0.3 / 3.14)

    def color_transform(self, img1, img2, rng):
        if rng.uniform() < self.asymmetric_color_aug_prob:
            img1 = self.photo_aug(img1, rng)
            img2 = self.photo_aug(img2, rng)
        else:
            stack = self.photo_aug(np.concatenate([img1, img2], axis=0), rng)
            img1, img2 = np.split(stack, 2, axis=0)
        return np.clip(img1, 0.0, 1.0), np.clip(img2, 0.0, 1.0)

    def _full_size_for(self, ht, wd):
        inst = (floor_multiple(ht), floor_multiple(wd))
        if self.full_size is None:
            return inst
        return (min(inst[0], self.full_size[0]), min(inst[1], self.full_size[1]))

    def spatial_transform(self, img1, img2, flow, valid, rng):
        if self.do_rotation:
            (img1, img2), flow, valid = random_rotation(
                [img1, img2], flow, valid, self.max_rotation, rng
            )
        ht, wd = img1.shape[:2]
        if self.full_size is not None and (ht < self.full_size[0] or wd < self.full_size[1]):
            # static-shape guarantee: upscale sources smaller than full_size
            s = max(self.full_size[0] / ht, self.full_size[1] / wd)
            t_h, t_w = int(np.ceil(ht * s)), int(np.ceil(wd * s))
            img1 = _resize(img1, t_h, t_w)
            img2 = _resize(img2, t_h, t_w)
            flow = _resize(flow, t_h, t_w, nearest=True) * np.asarray(
                [t_w / wd, t_h / ht], np.float32
            )
            valid = _resize(valid, t_h, t_w, nearest=True)
            ht, wd = t_h, t_w
        full_size = self._full_size_for(ht, wd)

        min_scale = max(
            (self.crop_size[0] + 8.0) / full_size[0],
            (self.crop_size[1] + 8.0) / full_size[1],
        )
        scale = 2.0 ** rng.uniform(self.min_scale, self.max_scale)
        sx = sy = scale
        if rng.uniform() < self.stretch_prob:
            sx *= 2.0 ** rng.uniform(-self.max_stretch, self.max_stretch)
            sy *= 2.0 ** rng.uniform(-self.max_stretch, self.max_stretch)
        sx, sy = max(sx, min_scale), max(sy, min_scale)

        if rng.uniform() < self.spatial_aug_prob:
            t_h, t_w = int(round(ht * sy)), int(round(wd * sx))
            t_h, t_w = max(t_h, full_size[0]), max(t_w, full_size[1])
            sy, sx = t_h / ht, t_w / wd
            img1 = _resize(img1, t_h, t_w)
            img2 = _resize(img2, t_h, t_w)
            flow = _resize(flow, t_h, t_w, nearest=True) * np.asarray(
                [sx, sy], np.float32
            )
            valid = _resize(valid, t_h, t_w, nearest=True)
            ht, wd = t_h, t_w

        y0 = int(rng.integers(0, ht - full_size[0] + 1))
        x0 = int(rng.integers(0, wd - full_size[1] + 1))
        sl = np.s_[y0 : y0 + full_size[0], x0 : x0 + full_size[1]]
        f_img1, f_img2 = img1[sl], img2[sl]
        f_flow, f_valid = flow[sl], valid[sl]

        if self.do_flip:
            if rng.uniform() < self.h_flip_prob:
                f_img1, f_img2 = f_img1[:, ::-1], f_img2[:, ::-1]
                f_flow = f_flow[:, ::-1] * np.asarray([-1.0, 1.0], np.float32)
                f_valid = f_valid[:, ::-1]
            if rng.uniform() < self.v_flip_prob:
                f_img1, f_img2 = f_img1[::-1], f_img2[::-1]
                f_flow = f_flow[::-1] * np.asarray([1.0, -1.0], np.float32)
                f_valid = f_valid[::-1]

        fh, fw = f_img1.shape[:2]
        y0 = int(rng.integers(0, (fh - self.crop_size[0]) // 8 + 1)) * 8
        x0 = int(rng.integers(0, (fw - self.crop_size[1]) // 8 + 1)) * 8
        sl = np.s_[y0 : y0 + self.crop_size[0], x0 : x0 + self.crop_size[1]]
        return (
            np.ascontiguousarray(f_img1[sl]),
            np.ascontiguousarray(f_img2[sl]),
            np.ascontiguousarray(f_flow[sl]),
            np.ascontiguousarray(f_valid[sl]),
            np.ascontiguousarray(f_img1),
            np.ascontiguousarray(f_img2),
            np.ascontiguousarray(f_flow),
            np.ascontiguousarray(f_valid),
            x0,
            y0,
        )

    def __call__(self, img1, img2, flow, valid, rng):
        (c1, c2, cf, cv, f1, f2, ff, fv, x0, y0) = self.spatial_transform(
            img1, img2, flow, valid, rng
        )
        c1, c2 = self.color_transform(c1, c2, rng)
        c2 = _eraser(c2, rng, self.eraser_aug_prob)
        return {
            "image1": np.clip(c1, 0.0, 1.0).astype(np.float32),
            "image2": np.clip(c2, 0.0, 1.0).astype(np.float32),
            "flow": cf.astype(np.float32),
            "valid": cv.astype(np.float32),
            "orig_image1": f1.astype(np.float32),
            "orig_image2": f2.astype(np.float32),
            "orig_flow": ff.astype(np.float32),
            "orig_valid": fv.astype(np.float32),
            "crop_yx": np.asarray([y0, x0], np.int32),
        }
