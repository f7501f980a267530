"""cloud_transformers_tpu — a TPU-native (JAX/XLA/Pallas) framework for point-cloud
processing via learned low-dimensional rasterizations ("Cloud Transformers",
arXiv:2007.11679).

Re-designed from scratch for TPU: channel-last layouts feeding the MXU,
scatter/gather splat kernels, pjit/GSPMD data parallelism (sync-BN for free),
and Pallas kernels for the hot splat/slice path.

Capability parity target: SamsungLabs/cloud_transformers (see SURVEY.md).
"""

__version__ = "0.1.0"

from cloud_transformers_tpu.core import (  # noqa: F401
    bilinear_coords,
    trilinear_coords,
    grid_positions,
    balance_op,
    so3_exponential_map,
    splat_max,
    slice_grid,
)
