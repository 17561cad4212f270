"""Warm-start forward interpolation (host-side).

Forward-splats the previous frame's flow onto the next frame's grid using scipy
nearest-neighbor griddata, exactly as the reference does on host via
``tf.numpy_function`` (``util/image.py:117-157``; the torch tree uses the same
scipy call, pytorch/core/utils/utils.py:26-54). Kept on host deliberately: the
scatter is tiny (1/64 resolution) and data-dependent.
"""
from __future__ import annotations

import numpy as np
from scipy import interpolate


def forward_interpolate(flow: np.ndarray) -> np.ndarray:
    """[H, W, 2] low-res flow -> forward-splatted flow for the next frame."""
    flow = np.asarray(flow, np.float32)
    dx, dy = flow[..., 0], flow[..., 1]
    ht, wd = dx.shape
    x0, y0 = np.meshgrid(np.arange(wd), np.arange(ht))
    x1 = x0 + dx
    y1 = y0 + dy

    x1f = x1.reshape(-1)
    y1f = y1.reshape(-1)
    dxf = dx.reshape(-1)
    dyf = dy.reshape(-1)

    pts = np.stack((x1f, y1f), axis=-1)
    xi = np.stack((x0.reshape(-1), y0.reshape(-1)), axis=-1).astype(np.float32)
    flow_x = interpolate.griddata(pts, dxf, xi, method="nearest", fill_value=0)
    flow_y = interpolate.griddata(pts, dyf, xi, method="nearest", fill_value=0)
    return np.stack([flow_x.reshape(ht, wd), flow_y.reshape(ht, wd)], axis=-1).astype(
        np.float32
    )
