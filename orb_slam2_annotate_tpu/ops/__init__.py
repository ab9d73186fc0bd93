from . import extractor, fast, hamming, matching, orb, pyramid, select
from .extractor import ExtractorConfig, Features, extract

__all__ = [
    "extractor", "fast", "hamming", "matching", "orb", "pyramid", "select",
    "ExtractorConfig", "Features", "extract",
]
