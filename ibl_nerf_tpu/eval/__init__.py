"""Evaluation: image metrics, full-path rendering, benchmark sweeps."""

from ibl_nerf_tpu.eval.metrics import psnr, ssim, mse
