from cloud_transformers_tpu.core.balance import balance_op
from cloud_transformers_tpu.core.coords import (
    bilinear_coords,
    trilinear_coords,
    grid_positions,
)
from cloud_transformers_tpu.core.so3 import so3_exponential_map
from cloud_transformers_tpu.core.splat_slice import (
    splat_max,
    slice_grid,
    splat_conv_slice,
    splat_max_mapping,
    slice_grid_mapping,
    splat_max_mapping_k,
    slice_grid_mapping_k,
    gridk_to_spatial,
    spatial_to_gridk,
)
from cloud_transformers_tpu.core.grid_mapping import grid_mapping, GridMapping
from cloud_transformers_tpu.core.noise import sphere_noise, partial_postprocess

__all__ = [
    "balance_op",
    "bilinear_coords",
    "trilinear_coords",
    "grid_positions",
    "so3_exponential_map",
    "splat_max",
    "slice_grid",
    "splat_conv_slice",
    "splat_max_mapping",
    "slice_grid_mapping",
    "splat_max_mapping_k",
    "slice_grid_mapping_k",
    "gridk_to_spatial",
    "spatial_to_gridk",
    "grid_mapping",
    "GridMapping",
    "sphere_noise",
    "partial_postprocess",
]
