"""Import-only `albumentations` stand-in for fixture generation.  The
reference only touches albumentations inside its augmentation functions,
which the parity tests never call."""


class _Stub:
    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, *args, **kwargs):
        raise NotImplementedError("albumentations shim: augmentation not available")


def __getattr__(name):
    return _Stub
