"""Datasets: synthetic fixtures and benchmark .mat ingest."""

from .synthetic import (
    random_tritd,
    sparse_outliers,
    synthetic_video,
    uniform_missing_mask,
    make_completion_problem,
)
from .loaders import (
    DATASETS,
    DatasetSpec,
    load_dataset,
    load_groundtruth,
    save_mat73,
    synthetic_video_truth,
)

__all__ = [
    "random_tritd",
    "sparse_outliers",
    "synthetic_video",
    "uniform_missing_mask",
    "make_completion_problem",
    "DATASETS",
    "DatasetSpec",
    "load_dataset",
    "load_groundtruth",
    "save_mat73",
    "synthetic_video_truth",
]
