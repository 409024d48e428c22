"""ibl_nerf_tpu — a TPU-native (JAX/XLA/Pallas) inverse-rendering framework.

Re-implements the capabilities of IBL-NeRF (changwoonchoi/IBL-NeRF,
arXiv:2210.08202): a neural field predicting density + intrinsics
(albedo, roughness, irradiance, radiance, prefiltered radiance mips),
shaded with the split-sum image-based-lighting approximation, supporting
intrinsic decomposition, material editing and object insertion.

Design is TPU-first: static shapes everywhere, one jitted train step
(including on-device pixel sampling), bf16-on-MXU compute paths, Pallas
kernels for the fused field evaluation, and SPMD data-parallelism over a
`jax.sharding.Mesh` ray axis.
"""

__version__ = "0.1.0"
