"""Numpy point-cloud augmentations (host-side, pre-device).

References: /root/reference/datasets/scanobjectnn.py:9-62 (jitter, y-rotation,
center, normalize) and datasets/s3dis_v2.py:19-446 (the richer S3DIS
pipeline: scale/rotate/flip, chromatic and HSV color jitter, elastic
distortion, random dropout).
"""

import numpy as np


def rotate_y(pcd, rng):
    """Random rotation about the up (y) axis (scanobjectnn.py:9-27)."""
    angle = rng.uniform() * 2 * np.pi
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=pcd.dtype)
    return pcd @ rot


def rotate_z(pcd, rng):
    angle = rng.uniform() * 2 * np.pi
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=pcd.dtype)
    return pcd @ rot


def jitter(pcd, rng, sigma=0.01, clip=0.05):
    """Per-point gaussian jitter, clipped (scanobjectnn.py:30-41)."""
    return pcd + np.clip(sigma * rng.randn(*pcd.shape), -clip, clip).astype(
        pcd.dtype)


def center(pcd):
    return pcd - pcd.mean(axis=0, keepdims=True)


def normalize_unit_sphere(pcd):
    """Divide by the furthest point radius (scanobjectnn.py:53-62)."""
    d = np.sqrt((pcd ** 2).sum(-1)).max()
    return pcd / max(d, 1e-12)


def random_scale(pcd, rng, low=0.8, high=1.25):
    return pcd * rng.uniform(low, high)


def random_flip_xy(pcd, rng, p=0.5):
    out = pcd.copy()
    for axis in (0, 1):
        if rng.rand() < p:
            out[:, axis] = -out[:, axis]
    return out

def random_dropout(pcd, labels, rng, max_ratio=0.875):
    """Replace a random suffix of points by the first point
    (s3dis_v2.py RandomDropout-style; keeps the array shape fixed)."""
    ratio = rng.rand() * max_ratio
    drop = rng.rand(pcd.shape[0]) < ratio
    out = pcd.copy()
    out[drop] = pcd[0]
    lab = labels.copy()
    lab[drop] = labels[0]
    return out, lab


def chromatic_jitter(colors, rng, std=0.01):
    """Per-point color noise, colors in [0, 1] (s3dis_v2.py chromatic
    augmentations)."""
    return np.clip(colors + rng.randn(*colors.shape) * std, 0, 1).astype(
        colors.dtype)


def chromatic_translation(colors, rng, ratio=0.05):
    return np.clip(colors + (rng.rand(1, 3) - 0.5) * 2 * ratio, 0, 1).astype(
        colors.dtype)


def chromatic_autocontrast(colors, rng, p=0.2):
    if rng.rand() >= p:
        return colors
    lo = colors.min(0, keepdims=True)
    hi = colors.max(0, keepdims=True)
    scale = 1.0 / np.maximum(hi - lo, 1e-6)
    blend = rng.rand()
    return (colors * (1 - blend) + blend * (colors - lo) * scale).astype(
        colors.dtype)


def elastic_distortion(coords, granularity, magnitude, rng):
    """Smooth random displacement field (s3dis_v2.py ElasticDistortion)."""
    blurs = [np.ones((3, 1, 1, 1)) / 3, np.ones((1, 3, 1, 1)) / 3,
             np.ones((1, 1, 3, 1)) / 3]
    mins = coords.min(0)
    dims = ((coords.max(0) - mins) // granularity).astype(int) + 3
    noise = rng.randn(*dims, 3).astype(np.float32)
    from scipy.ndimage import convolve
    for _ in range(2):
        for blur in blurs:
            noise = convolve(noise, blur, mode="constant", cval=0)
    ax = [np.linspace(d_min, d_max, d) for d_min, d_max, d in
          zip(mins - granularity, mins + granularity * (dims - 2), dims)]
    from scipy.interpolate import RegularGridInterpolator
    interp = RegularGridInterpolator(ax, noise, bounds_error=False,
                                     fill_value=0)
    return (coords + interp(coords) * magnitude).astype(coords.dtype)
