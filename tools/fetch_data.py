"""Benchmark dataset acquisition + conversion to the loader's .mat layout.

The reference repo ships NO data: its drivers `load(name + ".mat")` from a
user-provided directory (`traffic_triple_comparison.m:20`,
`video_triple_comparison.m:21`) with variable `T` (traffic) / `gray_images`
(video). This tool (a) downloads what is publicly fetchable, (b) converts
local raw data you obtained yourself into `data/<name>.mat`, and (c) writes
tiny REAL-FORMAT fixtures so the scipy/h5py ingest path is exercised even in
an offline environment.

Provenance notes (documented, not guessed — see docs/DATA.md for detail):

  * The four traffic tensors (sensor 54x4x1440, network 23x23x2016,
    taxi 100x100x500+, chicago 77x77x2016) are the benchmark set of the
    SOFIA paper (Lee et al., ICDE 2021), which the reference vendors under
    `other_methods/sofia`. The SOFIA authors distribute the preprocessed
    .mat tensors with their code release; the upstream raw sources are the
    Intel Berkeley Lab sensor logs (sensor), an internet-backbone traffic
    matrix (network), NYC TLC yellow-taxi trips aggregated to zone-to-zone
    hourly counts (taxi), and the City of Chicago crime log aggregated to
    community-area pairs (chicago). Because the exact aggregation scripts
    were never published, RRE parity claims REQUIRE the authors'
    preprocessed .mat files — place them in data/ unchanged.
  * The video tensors are CDnet2014 sequences (changedetection.net):
    300 consecutive grayscale frames at 240x320 of highway / office /
    PETS2006 (baseline category) and sofa (intermittentObjectMotion), plus
    the dataset's ground-truth label frames (0 static, 255 moving, 170
    outside ROI — `video_triple_comparison.m:342-360`).

Usage:
  python tools/fetch_data.py --download            # CDnet2014 (public URL)
  python tools/fetch_data.py --convert-cdnet DIR --name highway --start 1
  python tools/fetch_data.py --make-fixtures       # offline ingest fixtures
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CDNET_URL = "http://jacarini.dinf.usherbrooke.ca/static/dataset/"
CDNET_ZIPS = {
    "highway": "baseline/highway.zip",
    "office": "baseline/office.zip",
    "PETS2006": "baseline/PETS2006.zip",
    "sofa": "intermittentObjectMotion/sofa.zip",
}
# The reference evaluates 300 consecutive frames (BASELINE.md); CDnet's
# temporal ROI (temporalROI.txt) marks where labeled frames begin.
N_FRAMES = 300
FRAME_SHAPE = (240, 320)


def download_cdnet(data_dir: str, names=None) -> None:
    import urllib.request

    names = names or list(CDNET_ZIPS)
    os.makedirs(data_dir, exist_ok=True)
    for name in names:
        url = CDNET_URL + CDNET_ZIPS[name]
        zip_path = os.path.join(data_dir, f"{name}.zip")
        if not os.path.exists(zip_path):
            print(f"downloading {url} ...")
            urllib.request.urlretrieve(url, zip_path)
        extract_dir = os.path.join(data_dir, f"{name}_raw")
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(extract_dir)
        convert_cdnet(extract_dir, name, data_dir)


def _find_dir(root: str, leaf: str) -> str | None:
    for dirpath, dirnames, _ in os.walk(root):
        if os.path.basename(dirpath) == leaf:
            return dirpath
    return None


def convert_cdnet(
    raw_dir: str, name: str, out_dir: str, start: int | None = None
) -> str:
    """CDnet2014 sequence directory (input/in%06d.jpg + groundtruth/
    gt%06d.png + temporalROI.txt) -> data/<name>.mat (gray_images,
    (240, 320, 300) float64 in [0, 255]) + data/<name>_gt.mat
    (groundtruth labels, same shape)."""
    from PIL import Image

    from tritd_tpu.data.loaders import save_mat73

    input_dir = _find_dir(raw_dir, "input") or raw_dir
    gt_dir = _find_dir(raw_dir, "groundtruth")
    if start is None:
        roi = os.path.join(os.path.dirname(input_dir), "temporalROI.txt")
        start = int(open(roi).read().split()[0]) if os.path.exists(roi) else 1

    def load_stack(directory, pattern, mode):
        frames = []
        for k in range(start, start + N_FRAMES):
            img = Image.open(os.path.join(directory, pattern % k))
            img = img.convert(mode).resize(FRAME_SHAPE[::-1], Image.BILINEAR)
            frames.append(np.asarray(img, np.float64))
        return np.stack(frames, axis=-1)

    gray = load_stack(input_dir, "in%06d.jpg", "L")
    out = save_mat73(os.path.join(out_dir, f"{name}.mat"), {"gray_images": gray})
    print(f"wrote {out} shape {gray.shape}")
    if gt_dir:
        gt = load_stack(gt_dir, "gt%06d.png", "L")
        # NEAREST semantics for labels: re-load without bilinear smoothing
        frames = []
        for k in range(start, start + N_FRAMES):
            img = Image.open(os.path.join(gt_dir, "gt%06d.png" % k))
            img = img.convert("L").resize(FRAME_SHAPE[::-1], Image.NEAREST)
            frames.append(np.asarray(img, np.float64))
        gt = np.stack(frames, axis=-1)
        out_gt = save_mat73(
            os.path.join(out_dir, f"{name}_gt.mat"), {"groundtruth": gt}
        )
        print(f"wrote {out_gt}")
    return out


def convert_traffic_npy(npy_path: str, name: str, out_dir: str) -> str:
    """Convert a locally prepared 3-way numpy tensor (e.g. from the SOFIA
    release or your own aggregation) into the driver's .mat layout."""
    from tritd_tpu.data.loaders import save_mat73

    x = np.load(npy_path)
    if x.ndim != 3:
        raise ValueError(f"expected a 3-way tensor, got shape {x.shape}")
    return save_mat73(os.path.join(out_dir, f"{name}.mat"), {"T": x})


def make_fixtures(out_dir: str) -> None:
    """Tiny REAL-FORMAT fixtures for the ingest path: one v7 (scipy-written)
    and one v7.3 (HDF5 + MAT userblock) file of each driver layout. These
    are NOT the benchmark datasets — they prove data/loaders.py reads real
    MATLAB containers byte-layout-for-byte-layout."""
    import scipy.io as sio

    from tritd_tpu.data.loaders import save_mat73

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    t = rng.normal(size=(6, 5, 8))
    sio.savemat(os.path.join(out_dir, "fixture_traffic_v7.mat"), {"T": t})
    save_mat73(os.path.join(out_dir, "fixture_traffic_v73.mat"), {"T": t})
    video = rng.uniform(0, 255, size=(12, 16, 10))
    save_mat73(
        os.path.join(out_dir, "fixture_video_v73.mat"), {"gray_images": video}
    )
    np.savez(os.path.join(out_dir, "fixture_expected.npz"), T=t, gray_images=video)
    print(f"wrote ingest fixtures to {out_dir}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--download", action="store_true",
                   help="fetch + convert the CDnet2014 sequences")
    p.add_argument("--convert-cdnet", metavar="DIR",
                   help="convert an already-downloaded CDnet sequence dir")
    p.add_argument("--convert-traffic", metavar="NPY",
                   help="convert a local 3-way .npy tensor to <name>.mat")
    p.add_argument("--name", help="dataset name for --convert-*")
    p.add_argument("--start", type=int, default=None,
                   help="first frame index for --convert-cdnet")
    p.add_argument("--make-fixtures", action="store_true",
                   help="write tiny real-format ingest fixtures (offline)")
    args = p.parse_args(argv)

    if args.make_fixtures:
        make_fixtures(args.data_dir)
    if args.download:
        download_cdnet(args.data_dir)
    if args.convert_cdnet:
        if not args.name:
            p.error("--convert-cdnet requires --name")
        convert_cdnet(args.convert_cdnet, args.name, args.data_dir, args.start)
    if args.convert_traffic:
        if not args.name:
            p.error("--convert-traffic requires --name")
        convert_traffic_npy(args.convert_traffic, args.name, args.data_dir)
    if not any(
        (args.make_fixtures, args.download, args.convert_cdnet, args.convert_traffic)
    ):
        p.print_help()


if __name__ == "__main__":
    main()
