"""Registry alias: cached-wireframe on-device homography engine
(see homographies_ondevice.OnDeviceCachedWireframeDataset)."""

from .homographies_ondevice import OnDeviceCachedWireframeDataset

__main_dataset__ = OnDeviceCachedWireframeDataset
