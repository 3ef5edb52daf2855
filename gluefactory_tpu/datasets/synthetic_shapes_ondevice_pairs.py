"""Registry alias: two-view on-device synthetic-shapes engine
(see synthetic_shapes_ondevice.OnDeviceSyntheticShapesPairsDataset)."""

from .synthetic_shapes_ondevice import OnDeviceSyntheticShapesPairsDataset

__main_dataset__ = OnDeviceSyntheticShapesPairsDataset
