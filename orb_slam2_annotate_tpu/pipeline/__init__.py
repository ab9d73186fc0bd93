from . import frame, local_mapping, system, tracking
from .frame import Frame, make_frame_mono, make_frame_rgbd, make_frame_stereo
from .system import SlamConfig, System

__all__ = [
    "frame", "local_mapping", "system", "tracking",
    "Frame", "make_frame_mono", "make_frame_rgbd", "make_frame_stereo",
    "SlamConfig", "System",
]
