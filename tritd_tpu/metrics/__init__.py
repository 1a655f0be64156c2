"""Evaluation layer (L4 of SURVEY §1): reconstruction, image quality,
foreground segmentation."""

from .recon import evaluate, rre, relative_change
from .image import psnr, ssim_frame, quality
from .foreground import (
    ForegroundScores,
    foreground_scores,
    predict_masks,
    graythresh_matlab_double,
    average_precision,
    mean_average_precision,
)

__all__ = [
    "evaluate",
    "rre",
    "relative_change",
    "psnr",
    "ssim_frame",
    "quality",
    "ForegroundScores",
    "foreground_scores",
    "predict_masks",
    "graythresh_matlab_double",
    "average_precision",
    "mean_average_precision",
]
