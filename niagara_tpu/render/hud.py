"""Debug-text HUD overlay.

Role of the reference's debugtext.comp.glsl (embedded bitmap font rendered by
compute on top of the swapchain image).  Here a hand-authored 4x6 bitmap font
(digits + the lowercase letters the HUD uses) is rasterized into the image as
a dense masked blend — one vectorized jnp op per text blit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# 3x5 glyphs, rows top->bottom, each row is 3 bits (MSB = left pixel).
_GLYPHS = {
    "0": [0b111, 0b101, 0b101, 0b101, 0b111],
    "1": [0b010, 0b110, 0b010, 0b010, 0b111],
    "2": [0b111, 0b001, 0b111, 0b100, 0b111],
    "3": [0b111, 0b001, 0b111, 0b001, 0b111],
    "4": [0b101, 0b101, 0b111, 0b001, 0b001],
    "5": [0b111, 0b100, 0b111, 0b001, 0b111],
    "6": [0b111, 0b100, 0b111, 0b101, 0b111],
    "7": [0b111, 0b001, 0b010, 0b010, 0b010],
    "8": [0b111, 0b101, 0b111, 0b101, 0b111],
    "9": [0b111, 0b101, 0b111, 0b001, 0b111],
    ".": [0b000, 0b000, 0b000, 0b000, 0b010],
    ":": [0b000, 0b010, 0b000, 0b010, 0b000],
    "/": [0b001, 0b001, 0b010, 0b100, 0b100],
    "%": [0b101, 0b001, 0b010, 0b100, 0b101],
    "-": [0b000, 0b000, 0b111, 0b000, 0b000],
    " ": [0b000, 0b000, 0b000, 0b000, 0b000],
    "a": [0b000, 0b011, 0b101, 0b101, 0b011],
    "b": [0b100, 0b110, 0b101, 0b101, 0b110],
    "c": [0b000, 0b011, 0b100, 0b100, 0b011],
    "d": [0b001, 0b011, 0b101, 0b101, 0b011],
    "e": [0b010, 0b101, 0b111, 0b100, 0b011],
    "f": [0b001, 0b010, 0b111, 0b010, 0b010],
    "g": [0b011, 0b101, 0b011, 0b001, 0b110],
    "h": [0b100, 0b110, 0b101, 0b101, 0b101],
    "i": [0b010, 0b000, 0b010, 0b010, 0b010],
    "k": [0b100, 0b101, 0b110, 0b110, 0b101],
    "l": [0b010, 0b010, 0b010, 0b010, 0b010],
    "m": [0b000, 0b110, 0b111, 0b101, 0b101],
    "n": [0b000, 0b110, 0b101, 0b101, 0b101],
    "o": [0b000, 0b010, 0b101, 0b101, 0b010],
    "p": [0b000, 0b110, 0b101, 0b110, 0b100],
    "r": [0b000, 0b011, 0b100, 0b100, 0b100],
    "s": [0b000, 0b011, 0b110, 0b001, 0b110],
    "t": [0b010, 0b111, 0b010, 0b010, 0b001],
    "u": [0b000, 0b101, 0b101, 0b101, 0b011],
    "v": [0b000, 0b101, 0b101, 0b101, 0b010],
    "w": [0b000, 0b101, 0b101, 0b111, 0b011],
    "x": [0b000, 0b101, 0b010, 0b010, 0b101],
    "y": [0b101, 0b101, 0b011, 0b001, 0b110],
    "z": [0b000, 0b111, 0b001, 0b010, 0b111],
}

GLYPH_W, GLYPH_H = 4, 6  # 3x5 pixels + 1px spacing


def _text_bitmap(text: str) -> np.ndarray:
    """Render a string to a [GLYPH_H, len*GLYPH_W] 0/1 bitmap."""
    out = np.zeros((GLYPH_H, len(text) * GLYPH_W), dtype=np.float32)
    for i, ch in enumerate(text.lower()):
        rows = _GLYPHS.get(ch, _GLYPHS[" "])
        for r, bits in enumerate(rows):
            for c in range(3):
                if bits & (1 << (2 - c)):
                    out[r, i * GLYPH_W + c] = 1.0
    return out


def draw_text(image, text: str, x: int, y: int, color=(1.0, 1.0, 1.0), scale: int = 2):
    """Blend `text` onto image [H,W,3] at pixel (x, y); drop shadow like the
    reference (debugtext.comp.glsl:100-107).  Host-side text, device blend."""
    bitmap = _text_bitmap(text)
    if scale != 1:
        bitmap = np.kron(bitmap, np.ones((scale, scale), dtype=np.float32))
    bh, bw = bitmap.shape
    h, w = image.shape[:2]
    bh = min(bh, h - y)
    bw = min(bw, w - x)
    if bh <= 0 or bw <= 0:
        return image
    bm = jnp.asarray(bitmap[:bh, :bw])[..., None]
    col = jnp.asarray(np.array(color, dtype=np.float32))

    # drop shadow: shift by (scale, scale)
    sh = jnp.zeros_like(bm).at[scale:, scale:].set(bm[:-scale, :-scale])
    region = image[y : y + bh, x : x + bw]
    region = region * (1 - sh) * (1 - bm) + bm * col
    return image.at[y : y + bh, x : x + bw].set(region)


def draw_hud(image, lines: list[str], color=(1.0, 1.0, 1.0), scale: int = 2):
    """Stack text lines in the top-left corner (reference HUD layout)."""
    y = 4
    for line in lines:
        image = draw_text(image, line, 4, y, color=color, scale=scale)
        y += (GLYPH_H + 1) * scale
    return image
