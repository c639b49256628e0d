"""Core geometry: Lie groups, cameras, triangulation, epipolar geometry."""

from . import camera, epipolar, homography, lie, triangulate  # noqa: F401
