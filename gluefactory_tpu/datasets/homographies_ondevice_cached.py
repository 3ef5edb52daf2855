"""Registry alias: cached-feature on-device homography engine
(see homographies_ondevice.OnDeviceCachedFeatureDataset)."""

from .homographies_ondevice import OnDeviceCachedFeatureDataset

__main_dataset__ = OnDeviceCachedFeatureDataset
