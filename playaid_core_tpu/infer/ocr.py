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


def segment_digit_components(bgr_crop, threshold=128, min_area=12):
    """Threshold + connected components of a HUD crop, left-to-right.

    Returns (components, gray) where each component is a dict with
    ``x, y, w, h, mask`` (float 0/1) and ``patch`` (grayscale, bright
    pixels kept, background zeroed) — shared by the template and conv
    readers so train/eval see the same segmentation.
    """
    # Threshold the VALUE channel (per-pixel max), not luma: the damage
    # counter's fill shifts white -> saturated red as damage grows, and
    # saturated red has luma ~107 — below a mid-gray threshold — while its
    # max-channel stays at ~255.
    gray = bgr_crop.max(axis=2).astype(np.uint8)
    gray = cv2.resize(gray, (256, int(256 * gray.shape[0] / max(gray.shape[1], 1))))
    binary = (gray > threshold).astype(np.uint8)
    # Video codecs quantize thin strokes to pieces: a glyph then arrives
    # as several connected components, each fragment reads as an extra
    # digit and the height-drop decimal heuristic fires early ("143.1"
    # -> "14.0631").  A morphological close re-bridges 1-2 px stroke
    # gaps before labeling.
    binary = cv2.morphologyEx(binary, cv2.MORPH_CLOSE, np.ones((3, 3), np.uint8))
    num, labels, stats, _ = cv2.connectedComponentsWithStats(binary)
    raw = []
    for i in range(1, num):
        x, y, w, h, area = stats[i]
        if area < min_area:
            continue
        raw.append({"x": int(x), "y": int(y), "w": int(w), "h": int(h), "id": i})
    raw.sort(key=lambda c: c["x"])
    # Merge fragments whose x-extents overlap a neighbor's: digits are
    # laid out left-to-right without horizontal overlap, so overlapping
    # boxes are pieces of one glyph the close couldn't bridge.
    merged = []
    for c in raw:
        if merged:
            m = merged[-1]
            overlap = min(m["x"] + m["w"], c["x"] + c["w"]) - max(m["x"], c["x"])
            # Distinct digits never overlap horizontally (kerning survives
            # the close), so any >=2 px overlap marks a fragment.
            if overlap >= 2 or overlap > 0.3 * min(m["w"], c["w"]):
                x0 = min(m["x"], c["x"])
                y0 = min(m["y"], c["y"])
                x1 = max(m["x"] + m["w"], c["x"] + c["w"])
                y1 = max(m["y"] + m["h"], c["y"] + c["h"])
                m.update(x=x0, y=y0, w=x1 - x0, h=y1 - y0)
                m["ids"] = m.get("ids", [m["id"]]) + [c["id"]]
                continue
        merged.append(c)
    comps = []
    for c in merged:
        x, y, w, h = c["x"], c["y"], c["w"], c["h"]
        ids = c.get("ids", [c["id"]])
        mask = np.isin(labels[y : y + h, x : x + w], ids).astype(np.float32)
        patch = gray[y : y + h, x : x + w].astype(np.float32) * mask
        comps.append({"x": x, "y": y, "w": w, "h": h, "mask": mask, "patch": patch})
    return comps, gray


def assemble_reading(comps, digits, scores):
    """Shared decimal-point inference + value parse: decimal digits on the
    HUD render smaller, so a sharp height drop marks the fractional part
    (same geometry heuristic both readers use)."""
    heights = [c["h"] for c in comps]
    main_height = max(heights)
    out = []
    decimal_inserted = False
    for c, digit in zip(comps, digits):
        if not decimal_inserted and c["h"] < 0.72 * main_height and out:
            out.append(".")
            decimal_inserted = True
        out.append(digit or "?")
    raw = "".join(out)
    confidence = float(np.mean(scores)) if scores else 0.0
    try:
        value = float(raw)
    except ValueError:
        cleaned = extract_numbers(raw)
        if not cleaned:
            return False, (-1, raw, confidence, {"components": len(comps)})
        value = float(cleaned)
    return True, (value, raw, confidence, {"components": len(comps)})


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
        comps, _ = segment_digit_components(bgr_crop, self.threshold, self.min_area)
        if not comps:
            return False, (-1, "", 0.0, {"components": 0})
        digits, scores = [], []
        for c in comps:
            digit, score = self._classify_component(c["mask"])
            digits.append(digit)
            scores.append(score)
        return assemble_reading(comps, digits, scores)


def damage_crop_to_percent(damage_crop, reader):
    """Reference-shaped wrapper (reference: ai_runner.py:109-133)."""
    return reader(damage_crop)


def default_reader():
    """The framework's default damage reader: the trained conv digit
    classifier when its committed weights are present, else template
    matching.  Broken (as opposed to absent) weights are reported, not
    silently downgraded."""
    try:
        from playaid_core_tpu.infer.ocr_conv import ConvDigitOCR

        return ConvDigitOCR()
    except FileNotFoundError:
        return TemplateDigitOCR()  # intended fallback: no committed weights
    except Exception as e:
        import sys

        print(f"WARNING: conv OCR unavailable ({e!r}); falling back to "
              "template matching (lower accuracy on stylized HUDs)",
              file=sys.stderr)
        return TemplateDigitOCR()
