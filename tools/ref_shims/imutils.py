"""Minimal `imutils` stand-in for golden-fixture generation against the
read-only reference repo.  Mirrors imutils.resize's aspect-preserving
behavior (width wins when both are given)."""

import cv2


def resize(image, width=None, height=None, inter=cv2.INTER_AREA):
    (h, w) = image.shape[:2]
    if width is None and height is None:
        return image
    if width is None:
        r = height / float(h)
        dim = (int(w * r), height)
    else:
        r = width / float(w)
        dim = (width, int(h * r))
    return cv2.resize(image, dim, interpolation=inter)
