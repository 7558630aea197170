"""Minimal stand-in for the `addict` package, used ONLY to let the read-only
reference repo (which depends on addict) import during golden-fixture
generation.  The real runtime equivalent for the rebuilt framework lives at
``playaid_core_tpu/adict.py``.
"""

from playaid_core_tpu.adict import Dict  # noqa: F401
