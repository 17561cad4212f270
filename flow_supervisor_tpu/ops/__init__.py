"""Pure-function ops: coordinate grids, bilinear resampling, correlation volumes,
pyramid lookup, convex upsampling, padding/cropping. These are the XLA reference
implementations; Pallas kernels in ``flow_supervisor_tpu.kernels`` are drop-in
replacements validated against them.
"""

from flow_supervisor_tpu.ops.coords import (
    coords_grid,
    downsample_shape,
    initialize_coords,
    resize_flow,
    resize_image,
)
from flow_supervisor_tpu.ops.resampler import resampler, resample_flow_lookup
from flow_supervisor_tpu.ops.corr import (
    all_pairs_correlation,
    build_corr_pyramid,
    build_corr_pyramid_from_fmaps,
    combine_pyramid,
    corr_pyramid_lookup,
    corr_pyramid_lookup_combined,
    corr_pyramid_lookup_gather,
    transpose_corr_volume,
)
from flow_supervisor_tpu.ops.upsample import upsample_convex
from flow_supervisor_tpu.ops.pad import (
    pad_to_multiple,
    pad_spec_for,
    unpad,
    crop_bboxes,
    pad_bboxes,
    create_outgoing_mask,
)
from flow_supervisor_tpu.ops.warp import flow_to_warp, warp_image
