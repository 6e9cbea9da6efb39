from . import image, linop  # noqa: F401
