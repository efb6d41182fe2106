"""Pallas TPU kernels — the hot compute path.

The reference's OpenCL render kernel (per-pixel while-loop ray march,
reconstructed in SURVEY.md §1.1/§3.1) is replaced by *sweep kernels*: the
march is restructured as a front-to-back sweep over grid slices where each
step is a separable slice resample on the MXU plus elementwise compositing
on the VPU (see tpuvr/ops/geometry.py for the factorization). Kernels run
compiled on TPU and in interpret mode on CPU (tests).
"""

from tpuvr.kernels.sweep import sweep_fwd  # noqa: F401
