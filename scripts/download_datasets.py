#!/usr/bin/env python
"""Dataset downloaders: KITTI odometry, EuRoC MAV, TUM RGB-D, TartanAir,
TartanGround.

Equivalent of ``/root/reference/scripts/datasets/download_*.py``: fetch and
unpack the standard public sequences into datasets/<name>/. Requires
network access; environments without egress run the examples against
already-present data.

Usage:
  python scripts/download_datasets.py kitti --sequences 00 04
  python scripts/download_datasets.py euroc --sequences MH_01_easy
  python scripts/download_datasets.py tum --sequences rgbd_dataset_freiburg1_desk
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request
import zipfile
import tarfile

_SOURCES = {
    "kitti": {
        "base": "https://s3.eu-central-1.amazonaws.com/avg-kitti/",
        "files": ["data_odometry_gray.zip", "data_odometry_poses.zip"],
        "kind": "zip",
    },
    "euroc": {
        "base": "http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset/",
        "per_seq": lambda s: f"{'machine_hall' if s.startswith('MH') else 'vicon_room' + s[1]}/{s}/{s}.zip",
        "kind": "zip",
    },
    "tum": {
        "base": "https://cvg.cit.tum.de/rgbd/dataset/",
        "per_seq": lambda s: f"freiburg{s.split('freiburg')[1][0]}/{s}.tgz",
        "kind": "tgz",
    },
    "tartanground": {
        "base": "https://tartanground.blob.core.windows.net/tartanground-release/",
        "per_seq": lambda s: f"{s}/image_left.zip",
        "kind": "zip",
    },
    "tartanair": {
        "base": "https://tartanair.blob.core.windows.net/tartanair-release1/",
        "per_seq": lambda s: f"{s}/Easy/image_left.zip",
        "kind": "zip",
    },
}


def fetch(url: str, dest: str) -> str:
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    if os.path.exists(dest):
        print(f"cached: {dest}")
        return dest
    print(f"downloading {url}")
    urllib.request.urlretrieve(url, dest + ".part")
    os.rename(dest + ".part", dest)
    return dest


def unpack(archive: str, out_dir: str, kind: str) -> None:
    print(f"unpacking {archive} -> {out_dir}")
    if kind == "zip":
        with zipfile.ZipFile(archive) as z:
            z.extractall(out_dir)
    else:
        with tarfile.open(archive) as t:
            t.extractall(out_dir)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=sorted(_SOURCES))
    ap.add_argument("--sequences", nargs="*", default=[])
    ap.add_argument("--out", default="datasets")
    args = ap.parse_args()

    src = _SOURCES[args.dataset]
    out_dir = os.path.join(args.out, args.dataset)
    try:
        if "files" in src:
            for f in src["files"]:
                unpack(fetch(src["base"] + f, os.path.join(out_dir, f)), out_dir, src["kind"])
        else:
            for s in args.sequences:
                rel = src["per_seq"](s)
                unpack(
                    fetch(src["base"] + rel, os.path.join(out_dir, os.path.basename(rel))),
                    os.path.join(out_dir, s),
                    src["kind"],
                )
    except urllib.error.URLError as e:
        print(f"download failed ({e}); no network access?", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
