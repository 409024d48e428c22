"""Training: losses, phase schedule, optimizer, jitted train step, loop."""

from ibl_nerf_tpu.train.losses import LossConfig, Phase, resolve_phase, compute_losses
from ibl_nerf_tpu.train.step import TrainState, make_train_step, build_optimizer
