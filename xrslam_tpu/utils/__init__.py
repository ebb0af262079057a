from . import inspection, timing  # noqa: F401
