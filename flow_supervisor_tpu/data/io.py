"""Flow / image file IO (host-side, numpy).

Format parity with the reference (``raft_utils/frame_utils.py``, ``util/things_io.py``,
``data/flow_dataset.py:288-357``):

- Middlebury ``.flo``: little-endian, magic 202021.25, [w, h] int32 header, then
  interleaved (u, v) float32 row-major.
- ``.pfm`` (FlyingThings): PF/Pf header, scale sign = endianness, vertically
  flipped payload; flow files keep the first two channels.
- KITTI ``.png`` flow: 16-bit, (value - 2^15) / 64 for u/v, third channel = valid.
- Images: decoded to RGB float in [0, 1] (the reference loads BGR via cv2 then
  reverses channels and divides by 255, flow_dataset.py:288-296).
"""
from __future__ import annotations

import os
import re

import numpy as np

TAG_FLO = np.float32(202021.25)


def _native():
    """The threaded C decoders (native/fst_io.cc) when built and not disabled
    via FST_NATIVE_IO=0; None otherwise. The numpy readers below stay as the
    fallback and as the correctness oracle (tests/test_native_io.py)."""
    if os.environ.get("FST_NATIVE_IO", "1") == "0":
        return None
    from flow_supervisor_tpu.data import native

    return native if native.available() else None


def read_flo(path: str) -> np.ndarray:
    nat = _native()
    if nat is not None:
        return nat.read_flo(path)
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or magic[0] != TAG_FLO:
            raise ValueError(f"invalid .flo magic in {path}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    assert flow.ndim == 3 and flow.shape[2] == 2, flow.shape
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.asarray([TAG_FLO], np.float32).tofile(f)
        np.asarray(w, np.int32).tofile(f)
        np.asarray(h, np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_pfm(path: str) -> np.ndarray:
    nat = _native()
    if nat is not None:
        return nat.read_pfm(path)
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"not a PFM file: {path}")
        m = re.match(rb"^(\d+)\s(\d+)\s*$", f.readline())
        if not m:
            raise ValueError(f"malformed PFM header: {path}")
        width, height = map(int, m.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape))


def read_flow_kitti(path: str) -> tuple[np.ndarray, np.ndarray]:
    import cv2

    raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    raw = raw[:, :, ::-1].astype(np.float32)  # BGR -> RGB channel order (u, v, valid)
    flow, valid = raw[:, :, :2], raw[:, :, 2]
    return (flow - 2**15) / 64.0, valid


def write_flow_kitti(path: str, flow: np.ndarray) -> None:
    import cv2

    uv = 64.0 * flow + 2**15
    valid = np.ones([uv.shape[0], uv.shape[1], 1])
    out = np.concatenate([uv, valid], axis=-1).astype(np.uint16)
    cv2.imwrite(path, out[..., ::-1])


def read_image(path: str) -> np.ndarray:
    """RGB float32 in [0, 1], 3 channels (grayscale broadcast)."""
    if path.lower().endswith(".ppm"):
        nat = _native()
        if nat is not None:
            return nat.read_ppm(path)
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    img = img[:, :, ::-1].astype(np.float32) / 255.0
    return np.ascontiguousarray(img)


def read_flow_any(path: str):
    """Dispatch by extension: .flo / .pfm (first 2 channels) / .png (KITTI)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".flo":
        return read_flo(path), None
    if ext == ".pfm":
        data = read_pfm(path).astype(np.float32)
        return (data if data.ndim == 2 else data[:, :, :2]), None
    if ext == ".png":
        return read_flow_kitti(path)
    raise ValueError(f"unknown flow format: {path}")
