"""Shared utilities: metrics, logging."""

from tpuvr.utils.metrics import MetricsLogger, psnr  # noqa: F401
