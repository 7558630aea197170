"""Character-predictor data loader.

Working rebuild of the reference's legacy CharacterLoader interface
(reference: char_loader.py:1-103 — which imported modules that no longer
existed in that repo).  Same surface: a (frame_path, label) dataframe,
``crop_stock_info`` that keeps only the bottom HUD strip where the stock
icons identify the characters, and an indexable loader yielding
(feature, label).
"""

from __future__ import annotations

import os

import cv2
import numpy as np
import pandas as pd

# Width x height of the model input: the bottom strip of a resized frame.
CHAR_INPUT_SIZE = (480, 120)


def games_to_char_dataframe(games):
    """games: iterable of objects with ``char_label()`` and
    ``frame_paths`` (reference: char_loader.py:19-35)."""
    data = {"frame_path": [], "label": []}
    for game in games:
        label = game.char_label()
        for frame_path in game.frame_paths:
            data["frame_path"].append(frame_path)
            data["label"].append(label)
    return pd.DataFrame(data=data)


def dataframe_from_directory(root_dir):
    """Build a dataframe from ``root_dir/<label>/*.jpg`` trees."""
    data = {"frame_path": [], "label": []}
    for label_name in sorted(os.listdir(root_dir)):
        d = os.path.join(root_dir, label_name)
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if f.endswith((".jpg", ".png")):
                data["frame_path"].append(os.path.join(d, f))
                data["label"].append(label_name)
    return pd.DataFrame(data=data)


def crop_stock_info(frame):
    """Resize and keep the bottom HUD strip (reference:
    char_loader.py:50-57)."""
    frame = cv2.resize(frame, (CHAR_INPUT_SIZE[0], 250))
    return frame[-CHAR_INPUT_SIZE[1]:]


class CharacterLoader:
    """Random-sampling loader over the character dataframe
    (reference: char_loader.py:60-95)."""

    def __init__(self, dataframe, augment=True, transform=None, seed=None):
        self.char_dataframe = dataframe
        self.augment = augment
        self.transform = transform
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.char_dataframe)

    def __getitem__(self, idx):
        row = self.char_dataframe.iloc[int(self.rng.integers(0, len(self.char_dataframe)))]
        feature = cv2.imread(row["frame_path"])
        feature = crop_stock_info(feature)
        if self.transform:
            feature = self.transform(feature)
        else:
            feature = feature.astype(np.float32) / 255.0
        return feature, row["label"]
