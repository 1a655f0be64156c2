"""Benchmark dataset ingest.

The reference drivers `load(name + ".mat")` from a user-provided path
(`traffic_triple_comparison.m:20`, `video_triple_comparison.m:20`) — the
datasets themselves are NOT in the repo (SURVEY §2). Traffic .mat files hold
the tensor in variable `T` (cast `double(T)`, `:22`); video .mat files hold
`gray_images` (`:21`). Per-dataset constants from the drivers:

  * taxi is truncated to its first 500 frames (`traffic_triple_comparison.m:23-25`)
  * FCTN 4-way reshape subdims: sensor 6, network 16, taxi 10, chicago 8 (`:9`)
  * SOFIA seasonal period m: sensor 144, taxi 7, others 168 (`:79-86`)

When a .mat file is absent, loaders fall back to a seeded synthetic tensor of
the dataset's published shape so the pipeline (and bench.py) runs end-to-end
anywhere; the provenance of every load is reported.
"""

from __future__ import annotations

import dataclasses
import os
import zlib
from typing import Callable

import jax
import numpy as np

from .synthetic import random_tritd, seasonal_cp, synthetic_video


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    name: str
    kind: str                      # "traffic" | "video"
    mat_variable: str              # variable inside the .mat file
    shape: tuple[int, int, int]    # published/expected shape (synthetic fallback)
    truncate_frames: int | None = None  # taxi: keep first 500 mode-3 slices
    fctn_subdim: int = 8           # 4-way reshape factor for RC-FCTN
    sofia_period: int = 168        # SOFIA seasonal period m


# Shapes: traffic tensors follow the SOFIA/TriTD literature conventions for
# these public datasets; video is CDnet2014 at 240x320 x 300 frames
# (BASELINE.md: "300 consecutive CDnet2014 frames").
DATASETS: dict[str, DatasetSpec] = {
    "sensor": DatasetSpec("sensor", "traffic", "T", (54, 4, 1440), fctn_subdim=6, sofia_period=144),
    "network": DatasetSpec("network", "traffic", "T", (23, 23, 2016), fctn_subdim=16, sofia_period=168),
    "taxi": DatasetSpec("taxi", "traffic", "T", (100, 100, 500), truncate_frames=500, fctn_subdim=10, sofia_period=7),
    "chicago": DatasetSpec("chicago", "traffic", "T", (77, 77, 2016), fctn_subdim=8, sofia_period=168),
    "highway": DatasetSpec("highway", "video", "gray_images", (240, 320, 300), fctn_subdim=20, sofia_period=1),
    "sofa": DatasetSpec("sofa", "video", "gray_images", (240, 320, 300), fctn_subdim=20, sofia_period=1),
    "office": DatasetSpec("office", "video", "gray_images", (240, 320, 300), fctn_subdim=20, sofia_period=1),
    "PETS2006": DatasetSpec("PETS2006", "video", "gray_images", (240, 320, 300), fctn_subdim=20, sofia_period=1),
}

DEFAULT_DATA_DIR = os.environ.get("TRITD_DATA_DIR", "data")


def _load_mat_variable(path: str, variable: str) -> np.ndarray:
    """Read one variable from a .mat file (scipy for <= v7, h5py for v7.3).
    MATLAB stores arrays column-major, so the HDF5 (v7.3) layout appears
    dim-reversed to row-major readers — corrected by the transpose here."""
    try:
        import scipy.io as sio

        mat = sio.loadmat(path)
        if variable in mat:
            return np.asarray(mat[variable])
        candidates = [k for k in mat if not k.startswith("__")]
        if len(candidates) == 1:
            return np.asarray(mat[candidates[0]])
        raise KeyError(f"{variable} not in {path}; has {candidates}")
    except (NotImplementedError, ValueError):
        # v7.3 (scipy raises NotImplementedError) or a bare-HDF5 file
        # without the 128-byte MAT header (scipy raises ValueError).
        import h5py

        with h5py.File(path, "r") as f:
            key = variable if variable in f else list(f.keys())[0]
            arr = np.asarray(f[key])
        return arr.transpose(tuple(reversed(range(arr.ndim))))


def save_mat73(path: str, variables: dict[str, np.ndarray]) -> str:
    """Write a MATLAB v7.3-compatible .mat: an HDF5 file with the 128-byte
    MAT header in a userblock (116 bytes text, 8-byte subsystem offset,
    version 0x0200, little-endian tag 'IM') and arrays stored dim-reversed
    (column-major). Used by the dataset conversion tooling
    (tools/fetch_data.py) and to exercise the v7.3 ingest path in tests —
    scipy detects the header and defers to the HDF reader, exactly like a
    real MATLAB `save -v7.3` file."""
    import h5py

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w", userblock_size=512) as f:
        for name, arr in variables.items():
            a = np.asarray(arr)
            ds = f.create_dataset(
                name, data=a.transpose(tuple(reversed(range(a.ndim))))
            )
            ds.attrs["MATLAB_class"] = np.bytes_("double")
    header = b"MATLAB 7.3 MAT-file, written by tritd_tpu save_mat73"
    with open(path, "r+b") as fh:
        fh.write(header[:116].ljust(116, b"\x20"))
        fh.write(b"\x00" * 8)          # subsystem data offset
        fh.write(b"\x00\x02")          # version 0x0200 = v7.3
        fh.write(b"IM")                # little-endian indicator
    return path


def _dataset_seed(name: str) -> int:
    """Deterministic per-dataset seed. Python's salted str hash() is NOT
    stable across processes — crc32 is."""
    return zlib.crc32(name.encode())


def synthetic_video_truth(spec: DatasetSpec):
    """(observed, background, fg_mask) of the seeded CDnet-like stand-in —
    regenerable by metric code (bench.py F1/PSNR/SSIM) because the
    generation is deterministic per dataset name."""
    key = jax.random.PRNGKey(_dataset_seed(spec.name) % (2**31))
    return synthetic_video(key, spec.shape)


def synthetic_traffic(spec: DatasetSpec, key: jax.Array, noise_seed: int) -> np.ndarray:
    """Traffic-like MIXED-family stand-in (VERDICT r3 #7): unit-RMS
    low-TriTD-rank + 0.8x unit-RMS seasonal low-CP (period = the dataset's
    SOFIA preset) + 10% relative noise, scaled to an O(100) dynamic range.
    A pure-TriTD stand-in made SOFIA's rows degenerate (RRE ~0.99 — its
    CP+seasonal model had literally nothing to fit); the mixture gives
    every benchmarked method structure in its own family while the
    shapes/iteration counts — hence compute profiles — are unchanged.
    Parameterized by key so validation tools can sweep fresh data seeds
    at benchmark shape (e.g. tools/validate_warm_svt.py --data-seeds)."""
    k_tritd, k_cp = jax.random.split(key)
    x_tritd, _ = random_tritd(k_tritd, spec.shape, rank=5, dtype=np.float32)
    x_cp = seasonal_cp(k_cp, spec.shape, rank=3, period=spec.sofia_period)
    x = np.asarray(x_tritd) + 0.8 * np.asarray(x_cp)
    rng = np.random.default_rng(noise_seed)
    noise = rng.standard_normal(x.shape)
    x = x + 0.1 * np.linalg.norm(x) / np.linalg.norm(noise) * noise
    return 50.0 * x


def _synthetic_fallback(spec: DatasetSpec) -> np.ndarray:
    """Seeded stand-in with low-TriTD-rank structure + dataset-flavored
    scaling so solvers exercise realistic dynamics. No rectification
    anywhere: abs()/clip on the low-rank part would destroy the structure
    the solvers are benchmarked on."""
    seed = _dataset_seed(spec.name)
    key = jax.random.PRNGKey(seed % (2**31))
    if spec.kind == "video":
        observed, _bg, _fg = synthetic_video(key, spec.shape)
        x = np.asarray(observed)
    else:
        x = synthetic_traffic(spec, key, seed)
    return x.astype(np.float64)


def load_dataset(
    name: str, data_dir: str | None = None
) -> tuple[np.ndarray, DatasetSpec, str]:
    """Returns (tensor float64, spec, provenance) with provenance in
    {"mat", "synthetic"}. Applies the driver's per-dataset preprocessing
    (double cast, taxi truncation)."""
    if name not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; known: {sorted(DATASETS)}")
    spec = DATASETS[name]
    data_dir = data_dir or DEFAULT_DATA_DIR
    path = os.path.join(data_dir, f"{name}.mat")
    if os.path.exists(path):
        x = _load_mat_variable(path, spec.mat_variable).astype(np.float64)
        provenance = "mat"
    else:
        x = _synthetic_fallback(spec)
        provenance = "synthetic"
    if spec.truncate_frames is not None and x.shape[-1] > spec.truncate_frames:
        x = x[..., : spec.truncate_frames]
    return x, spec, provenance


def load_groundtruth(
    name: str, data_dir: str | None = None
) -> np.ndarray | None:
    """CDnet ground-truth label frames (<name>_gt.mat with labels 0/170/255),
    if present — used by the foreground metrics."""
    data_dir = data_dir or DEFAULT_DATA_DIR
    path = os.path.join(data_dir, f"{name}_gt.mat")
    if not os.path.exists(path):
        return None
    return _load_mat_variable(path, "groundtruth")
