from . import map_state
from .map_state import MapState, empty_map

__all__ = ["map_state", "MapState", "empty_map"]
