"""2D overlays for reconstruction video frames: captions, histogram, bar.

PIL-based equivalent of the reference's matplotlib/text overlays
(/root/reference/ace_visualizer.py:452-696): a phase caption with a sub-line,
a confidence histogram in the corner during relocalization, and a loading
bar during mapping.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw, ImageFont

_FONT = None


def _font(size: int = 24):
    global _FONT
    if _FONT is None:
        try:
            _FONT = ImageFont.truetype(
                "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf", size
            )
        except OSError:
            _FONT = ImageFont.load_default()
    return _FONT


def draw_caption(img: np.ndarray, title: str, subtitle: str | None = None) -> np.ndarray:
    """Phase caption, top-left (reference captions, ace_visualizer.py:452+)."""
    pil = Image.fromarray(img)
    d = ImageDraw.Draw(pil)
    d.rectangle([16, 14, 16 + 620, 14 + (66 if subtitle else 42)], fill=(20, 20, 30))
    d.text((28, 20), title, fill=(240, 240, 240), font=_font())
    if subtitle:
        d.text((28, 48), subtitle, fill=(170, 200, 255), font=_font())
    return np.asarray(pil)


def draw_loading_bar(img: np.ndarray, fraction: float, label: str = "") -> np.ndarray:
    """Training-progress bar along the bottom (ace_visualizer.py:641-696)."""
    h, w = img.shape[:2]
    pil = Image.fromarray(img)
    d = ImageDraw.Draw(pil)
    x0, x1, y0, y1 = 16, w - 16, h - 38, h - 16
    d.rectangle([x0, y0, x1, y1], fill=(20, 20, 30))
    fx = x0 + 2 + (x1 - x0 - 4) * float(np.clip(fraction, 0.0, 1.0))
    d.rectangle([x0 + 2, y0 + 2, fx, y1 - 2], fill=(90, 170, 90))
    if label:
        d.text((x0 + 10, y0 - 1), label, fill=(245, 245, 245), font=_font(18))
    return np.asarray(pil)


def draw_conf_histogram(
    img: np.ndarray,
    confidences: np.ndarray,
    threshold: float,
    conf_max: float = 4000.0,
    bins: int = 20,
) -> np.ndarray:
    """Confidence histogram, bottom-right, green above / red below threshold
    (the reloc-phase histogram, ace_visualizer.py:452-561)."""
    h, w = img.shape[:2]
    bw, bh = 300, 120
    x0, y0 = w - bw - 16, h - bh - 48
    pil = Image.fromarray(img)
    d = ImageDraw.Draw(pil)
    d.rectangle([x0, y0, x0 + bw, y0 + bh], fill=(20, 20, 30))

    if confidences.size:
        edges = np.linspace(0.0, conf_max, bins + 1)
        counts, _ = np.histogram(np.clip(confidences, 0, conf_max), bins=edges)
        peak = max(int(counts.max()), 1)
        bar_w = (bw - 20) / bins
        for i, c in enumerate(counts):
            bx0 = x0 + 10 + i * bar_w
            bar_h = (bh - 36) * c / peak
            color = (90, 190, 90) if edges[i] >= threshold else (200, 80, 80)
            d.rectangle([bx0, y0 + bh - 12 - bar_h, bx0 + bar_w - 2, y0 + bh - 12], fill=color)
    d.text((x0 + 10, y0 + 4), "registration confidence", fill=(230, 230, 230), font=_font(16))
    return np.asarray(pil)
