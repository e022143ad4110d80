"""Point-cloud visualisation (reference: utils/helpers.py:42-60).

Renders a cloud to an RGB image via matplotlib's 3D scatter — used for
qualitative inspection and TB image logging. Matplotlib is imported lazily
so headless/TPU paths never pay for it.
"""

from __future__ import annotations

import numpy as np


def get_ptcloud_img(ptcloud: np.ndarray, roll: float = 30.0, pitch: float = -45.0) -> np.ndarray:
    """Render (N, 3) points to an (H, W, 3) uint8 image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    x, z, y = ptcloud.transpose(1, 0)
    ax = fig.add_subplot(111, projection="3d")
    ax.axis("off")
    ax.view_init(roll, pitch)
    lim = float(np.max(np.abs(ptcloud))) or 0.5
    ax.set_xbound(-lim, lim)
    ax.set_ybound(-lim, lim)
    ax.set_zbound(-lim, lim)
    ax.scatter(x, y, z, zdir="z", c=y, cmap="jet", s=1)

    fig.canvas.draw()
    img = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    w, h = fig.canvas.get_width_height()
    img = img.reshape(h, w, 4)[..., :3].copy()
    plt.close(fig)
    return img
