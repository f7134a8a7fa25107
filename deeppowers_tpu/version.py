"""Version info for deeppowers-tpu.

Mirrors the reference's version surface (reference: src/api/python/deeppowers/version.py)
but reports TPU platform facts instead of CUDA ones.
"""

__version__ = "0.1.0"

VERSION_MAJOR = 0
VERSION_MINOR = 1
VERSION_PATCH = 0


def version() -> str:
    return __version__
