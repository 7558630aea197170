"""HUD damage OCR.

The reference reads each player's damage percentage from fixed HUD crops
with PaddleOCR (reference: ai_runner.py:537-590, :109-133).  Paddle's C++
runtime is replaced by a dependency-free template-matching digit reader:
digit glyph templates (rendered from a font, or captured from real HUD
frames) are matched against thresholded connected components of the HUD
crop, left-to-right, with the decimal point inferred from component
geometry.  The reader is pluggable — any callable
``(bgr_crop) -> (ok, (value, raw_string, confidence, details))`` can be
swapped in, preserving the reference's interface shape.
"""

from __future__ import annotations

import re

import cv2
import numpy as np
from PIL import Image, ImageDraw, ImageFont

from playaid_core_tpu.constants import TEXT_FONT_PATH

# Fixed HUD damage locations for a 1280x720 canvas
# (reference: ai_runner.py:553-569).
PLAYER_DAMAGE_CROPS = {
    0: dict(center_x=402 / 1280, center_y=637 / 720, crop_width=133 / 1280,
            crop_height=60 / 720),
    1: dict(center_x=898 / 1280, center_y=637 / 720, crop_width=133 / 1280,
            crop_height=60 / 720),
}


def extract_numbers(text: str) -> str:
    return "".join(re.findall(r"\d+", text))


def render_digit_templates(height=40, font_path=TEXT_FONT_PATH):
    """Render 0-9 glyph templates as binarised arrays."""
    templates = {}
    try:
        font = ImageFont.truetype(font_path, height)
    except OSError:
        font = ImageFont.load_default()
    for d in "0123456789":
        img = Image.new("L", (height, int(height * 1.4)), 0)
        draw = ImageDraw.Draw(img)
        draw.text((2, 2), d, font=font, fill=255)
        arr = np.array(img)
        ys, xs = np.nonzero(arr > 32)
        if len(ys) == 0:
            continue
        tight = arr[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]
        templates[d] = (tight > 32).astype(np.float32)
    return templates


class TemplateDigitOCR:
    """Digit reader over thresholded connected components."""

    def __init__(self, templates=None, threshold=128, min_area=12):
        self.templates = templates or render_digit_templates()
        self.threshold = threshold
        self.min_area = min_area

    def _classify_component(self, comp):
        best_digit, best_score = None, -1.0
        for digit, tmpl in self.templates.items():
            resized = cv2.resize(
                comp.astype(np.float32), (tmpl.shape[1], tmpl.shape[0]),
                interpolation=cv2.INTER_AREA,
            )
            denom = np.linalg.norm(resized) * np.linalg.norm(tmpl)
            score = float((resized * tmpl).sum() / denom) if denom else 0.0
            if score > best_score:
                best_digit, best_score = digit, score
        return best_digit, best_score

    def __call__(self, bgr_crop):
        """Returns (ok, (value, raw_string, confidence, details)) in the
        reference's damage_crop_to_percent shape (ai_runner.py:109-133)."""
        gray = cv2.cvtColor(bgr_crop, cv2.COLOR_BGR2GRAY)
        gray = cv2.resize(gray, (256, int(256 * gray.shape[0] / max(gray.shape[1], 1))))
        binary = (gray > self.threshold).astype(np.uint8)
        num, labels, stats, _ = cv2.connectedComponentsWithStats(binary)

        comps = []
        for i in range(1, num):
            x, y, w, h, area = stats[i]
            if area < self.min_area:
                continue
            comps.append((x, y, w, h, i))
        comps.sort(key=lambda c: c[0])
        if not comps:
            return False, (-1, "", 0.0, {"components": 0})

        heights = [c[3] for c in comps]
        main_height = max(heights)
        digits, scores = [], []
        decimal_inserted = False
        for x, y, w, h, i in comps:
            comp = (labels[y : y + h, x : x + w] == i).astype(np.float32)
            # Decimal digits on the HUD render smaller; a sharp height drop
            # marks the fractional part.
            if not decimal_inserted and h < 0.72 * main_height and digits:
                digits.append(".")
                decimal_inserted = True
            digit, score = self._classify_component(comp)
            digits.append(digit or "?")
            scores.append(score)

        raw = "".join(digits)
        confidence = float(np.mean(scores)) if scores else 0.0
        try:
            value = float(raw)
        except ValueError:
            cleaned = extract_numbers(raw)
            if not cleaned:
                return False, (-1, raw, confidence, {"components": len(comps)})
            value = float(cleaned)
        return True, (value, raw, confidence, {"components": len(comps)})


def damage_crop_to_percent(damage_crop, reader):
    """Reference-shaped wrapper (reference: ai_runner.py:109-133)."""
    return reader(damage_crop)
