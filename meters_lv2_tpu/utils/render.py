"""Inline-display rendering: needle and bargraph mini-views as arrays.

The reference provides host-embedded mini-meters via the LV2 inline-display
extension (src/dpy_needle.c:54-157, src/dpy_bargraph.c:97-150, cairo).
Here the same capability renders to numpy RGBA images using the identical
deflection transfer curves (utils/db) — suitable for notebooks, web UIs or
video overlay, and batch-friendly.
"""

from __future__ import annotations

import math

import numpy as np

from . import db


def needle_image(
    value: float,
    meter_type: int = db.MT_VU,
    width: int = 120,
    height: int | None = None,
) -> np.ndarray:
    """Render a needle meter face -> [H, W, 4] uint8 RGBA.

    Mirrors the geometry of needle_render (dpy_needle.c:14-47): deflection
    in [0, 1.05] maps to a ±45° needle sweep.
    """
    h = height or int(math.ceil(width * 17.0 / 30.0))
    img = np.zeros((h, width, 4), np.uint8)
    img[..., :3] = 28
    img[..., 3] = 255

    x0, y0 = width / 2.0, h * 1.2
    rad = h * 1.0

    # scale arc ticks
    for frac in np.linspace(0.0, 1.0, 11):
        a = (frac - 0.5) * 1.5708
        x = int(x0 + math.sin(a) * rad)
        y = int(y0 - math.cos(a) * rad)
        if 0 <= x < width and 0 <= y < h:
            img[max(y - 1, 0) : y + 1, max(x - 1, 0) : x + 1, :3] = 160

    d = float(np.clip(db.meter_deflect(meter_type, np.float32(value)), 0.0, 1.05))
    a = (d - 0.5) * 1.5708
    n = max(h, width)
    ts = np.linspace(0.35, 1.0, n)
    xs = (x0 + np.sin(a) * rad * ts).astype(int)
    ys = (y0 - np.cos(a) * rad * ts).astype(int)
    ok = (xs >= 0) & (xs < width) & (ys >= 0) & (ys < h)
    img[ys[ok], xs[ok], :3] = np.array([230, 60, 40], np.uint8)
    return img


def bargraph_image(
    db_value: float,
    krange: float = 20.0,
    width: int = 16,
    height: int = 120,
) -> np.ndarray:
    """Render a K-meter bargraph -> [H, W, 4] uint8 RGBA with the reference
    color bands (green below 0K, amber to +3, red above; dpy_bargraph.c)."""
    img = np.zeros((height, width, 4), np.uint8)
    img[..., :3] = 24
    img[..., 3] = 255
    d = float(db.kmeter_deflect(np.float32(db_value), krange))
    top = int(round(height * d))
    thr0 = float(db.kmeter_deflect(np.float32(-krange), krange))  # 0K mark
    thr3 = float(db.kmeter_deflect(np.float32(3.0 - krange), krange))
    for row in range(top):
        frac = row / max(height - 1, 1)
        if frac < thr0:
            c = (0, 180, 40)
        elif frac < thr3:
            c = (230, 180, 0)
        else:
            c = (230, 40, 30)
        img[height - 1 - row, 1 : width - 1, :3] = c
    return img


def radar_image(
    radar_db: np.ndarray,
    pos: int,
    size: int = 200,
    floor_db: float = -60.0,
) -> np.ndarray:
    """Render the EBU radar loudness history -> [size, size, 4] RGBA
    (gui/ebur.c radar view: angle = ring index, radius = loudness)."""
    img = np.zeros((size, size, 4), np.uint8)
    img[..., 3] = 255
    c = size / 2.0
    n = len(radar_db)
    vals = np.clip((np.nan_to_num(radar_db, neginf=floor_db) - floor_db)
                   / (-floor_db), 0.0, 1.0)
    for i in range(n):
        ang = 2 * math.pi * ((i - pos) % n) / n - math.pi / 2
        r = vals[i] * (c - 2)
        steps = max(int(r), 1)
        ts = np.linspace(0, r, steps)
        xs = (c + np.cos(ang) * ts).astype(int)
        ys = (c + np.sin(ang) * ts).astype(int)
        ok = (xs >= 0) & (xs < size) & (ys >= 0) & (ys < size)
        g = np.uint8(60 + 195 * vals[i])
        img[ys[ok], xs[ok], 1] = np.maximum(img[ys[ok], xs[ok], 1], g)
        img[ys[ok], xs[ok], 2] = 60
    return img
