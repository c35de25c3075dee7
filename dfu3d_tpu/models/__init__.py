from .detectors import build_network, CenterPoint
