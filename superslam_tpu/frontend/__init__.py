from .extractor import SuperPointExtractor
from .features import PaddedFeatures, host_descriptors
from .matcher import LightGlueMatcher
from .recognizer import EigenPlacesRecognizer
from .rgbd_frontend import RgbdFrontEnd
from .stereo_frontend import StereoFrontEnd

__all__ = [
    "SuperPointExtractor",
    "PaddedFeatures",
    "host_descriptors",
    "LightGlueMatcher",
    "EigenPlacesRecognizer",
    "RgbdFrontEnd",
    "StereoFrontEnd",
]
