"""Robust estimation: batched RANSAC / PARSAC / IMU-PARSAC and the
minimal solvers' consensus wrappers."""

from . import core, parsac, pnp, stereo  # noqa: F401
