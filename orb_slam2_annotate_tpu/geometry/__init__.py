from . import lie, camera, twoview
from .camera import CameraModel

__all__ = ["lie", "camera", "twoview", "CameraModel"]
