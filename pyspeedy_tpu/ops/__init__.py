from . import geometry, spectral  # noqa: F401
