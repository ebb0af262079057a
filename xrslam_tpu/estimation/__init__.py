from . import window, factors, solver  # noqa: F401
