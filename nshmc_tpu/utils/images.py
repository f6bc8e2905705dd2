"""Image IO and value-range transforms.

Mirrors the reference data path (ref: datasets/__init__.py:199-226
data_transform / inverse_data_transform with rescaled=True, and the PNG
dumping + pixel-wise std-dev maps of main_sampling.py:452-516) without the
torch/torchvision dependency: PIL for IO, numpy/jax for math.
"""
from __future__ import annotations

import os
from typing import Iterable, List, Tuple

import numpy as np
import jax.numpy as jnp


def data_transform(x01: jnp.ndarray) -> jnp.ndarray:
    """[0, 1] -> [-1, 1] (rescaled=True path, datasets/__init__.py:199-214)."""
    return 2.0 * x01 - 1.0


def inverse_data_transform(x: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> [0, 1] clipped (datasets/__init__.py:216-226)."""
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)


def load_image(path: str, size: int = 256) -> np.ndarray:
    """PNG/JPG -> float32 [0, 1] (H, W, 3), resized like the reference's
    Resize(image_size) transform (datasets/__init__.py:112-131)."""
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size), Image.BICUBIC)
    return np.asarray(img, np.float32) / 255.0


def save_image(x01, path: str):
    """float [0, 1] (H, W, 3) -> 8-bit PNG."""
    from PIL import Image

    arr = np.asarray(jnp.clip(x01, 0, 1) * 255.0).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)


def save_std_dev_map(samples01: np.ndarray, path: str):
    """Pixel-wise std-dev heatmap across a sample stack (S, H, W, C)
    (ref: main_sampling.py:494-508)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    std = np.asarray(samples01).std(axis=0).mean(axis=-1)
    rng = std.max() - std.min()
    std_plot = (std - std.min()) / (rng if rng > 0 else 1.0)
    fig, ax = plt.subplots(1, 1, figsize=(6, 5))
    im = ax.imshow(std_plot, cmap="hot")
    fig.colorbar(im, ax=ax, label="Std Dev")
    ax.set_title("Pixel-wise Std Dev Across Samples")
    ax.axis("off")
    plt.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path, dpi=300)
    plt.close(fig)


def list_dataset(root: str, exts=(".png", ".jpg", ".jpeg")) -> List[str]:
    """Sorted recursive listing of image files (the reference ships its eval
    set at exp/datasets/ffhq/samples_1k, 100 PNGs)."""
    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.lower().endswith(exts):
                out.append(os.path.join(dirpath, f))
    return sorted(out)
