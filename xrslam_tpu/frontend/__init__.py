from . import image, klt  # noqa: F401
