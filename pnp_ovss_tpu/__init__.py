"""PnP-OVSS TPU: training-free open-vocabulary semantic segmentation, TPU-native."""

__version__ = "0.1.0"
