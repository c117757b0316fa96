from detectinblur_tpu.ops.trajectory import sample_trajectory, TrajectoryParams
from detectinblur_tpu.ops.psf import (
    rasterize_psf,
    center_psf,
    find_offsets,
    psf_principal_components,
    sample_psf,
    crop_center,
)
from detectinblur_tpu.ops.blur import apply_psf_blur, fft_blur, batched_blur
