"""Dataset loading, prefiltered pyramids, on-device batch sampling."""

from ibl_nerf_tpu.data.dataset import SceneData, load_scene
from ibl_nerf_tpu.data.pyramid import build_prefiltered_pyramid
from ibl_nerf_tpu.data.sampler import (
    device_arrays_from_scene,
    sample_pixel_batch,
)
from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
