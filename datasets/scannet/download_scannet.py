#!/usr/bin/env python
"""ScanNet release downloader (TOS-gated official server).

Capability parity with the reference's vendored tool
(/root/reference/dataset/scannet/download-scannet.py:1-236) rebuilt around a
pure *plan* stage (URL/destination pairs, unit-testable offline) and a
resumable fetch stage (atomic tmp+rename, skip-existing, bounded retries,
optional thread pool — the server is far away and per-file latency
dominates small files).

ScanNet access requires agreeing to the Terms of Use
(http://kaldir.vc.in.tum.de/scannet/ScanNet_TOS.pdf) and is intended for
non-commercial research. This tool only automates the transfer; pass
``--agree-tos`` (or answer the prompt) to confirm you hold access.

Typical invocations::

  # everything openscene needs: 3D meshes + labels + 2D .sens + label map
  python download_scannet.py -o /data/scannet --type _vh_clean_2.ply
  python download_scannet.py -o /data/scannet --type .sens
  python download_scannet.py -o /data/scannet --label-map

  # one scan, all file types
  python download_scannet.py -o /data/scannet --id scene0000_00
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import os
import sys
import tempfile
import time
import urllib.request
from typing import Iterable, List, NamedTuple, Optional, Sequence

BASE_URL = "http://kaldir.vc.in.tum.de/scannet/"
TOS_URL = BASE_URL + "ScanNet_TOS.pdf"

FILETYPES = [
    ".aggregation.json", ".sens", ".txt",
    "_vh_clean.ply", "_vh_clean_2.0.010000.segs.json", "_vh_clean_2.ply",
    "_vh_clean.segs.json", "_vh_clean.aggregation.json",
    "_vh_clean_2.labels.ply",
    "_2d-instance.zip", "_2d-instance-filt.zip",
    "_2d-label.zip", "_2d-label-filt.zip",
]
FILETYPES_TEST = [".sens", ".txt", "_vh_clean.ply", "_vh_clean_2.ply"]
LABEL_MAP = {"v2": "scannetv2-labels.combined.tsv",
             "v1": "scannet-labels.combined.tsv"}
PREPROCESSED_FRAMES = ("scannet_frames_25k.zip", "5.6GB")
TEST_FRAMES = ("scannet_frames_test.zip", "610MB")
DATA_EFFICIENT = ["limited-reconstruction-scenes.zip",
                  "limited-annotation-points.zip", "limited-bboxes.zip"]
RELEASE_SIZE = "1.2TB"


class Item(NamedTuple):
    url: str
    dest: str  # relative to out_dir


def scan_items(scan_id: str, file_types: Sequence[str], release: str = "v2",
               test_scan: bool = False) -> List[Item]:
    """Plan one scan's files. v2 train scans fetch ``.sens`` from the v1
    tree (v2 reuses v1's sensor streams; the v2 tree does not carry them)."""
    sub = "scans_test" if test_scan else "scans"
    items = []
    for ft in file_types:
        rel = release
        if release == "v2" and ft == ".sens" and not test_scan:
            rel = "v1"
        items.append(Item(
            url=f"{BASE_URL}{rel}/scans/{scan_id}/{scan_id}{ft}",
            dest=os.path.join(sub, scan_id, scan_id + ft)))
    return items


def tasks_item(name: str, release: str = "v2") -> Item:
    return Item(url=f"{BASE_URL}{release}/tasks/{name}",
                dest=os.path.join("tasks", name))


def label_map_item(release: str = "v2") -> Item:
    name = LABEL_MAP[release]
    return Item(url=f"{BASE_URL}{release}/tasks/{name}", dest=name)


def release_scan_list(release: str = "v2", test: bool = False,
                      opener=urllib.request.urlopen) -> List[str]:
    url = f"{BASE_URL}{release}/scans{'_test' if test else ''}.txt"
    with opener(url) as fh:
        return [ln.decode("utf8").strip() for ln in fh if ln.strip()]


def fetch(item: Item, out_dir: str, retries: int = 3,
          urlretrieve=urllib.request.urlretrieve) -> str:
    """Idempotent download: skip existing, write to a temp file in the
    destination directory and rename (a crash never leaves a truncated
    file under the final name)."""
    dest = os.path.join(out_dir, item.dest)
    if os.path.isfile(dest):
        return "skip"
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    last = None
    for attempt in range(retries):
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(dest),
                                   prefix=".dl_", suffix=".part")
        os.close(fd)
        try:
            urlretrieve(item.url, tmp)
            os.replace(tmp, dest)
            return "ok"
        except Exception as e:  # noqa: BLE001 — retry any transport error
            last = e
            if os.path.exists(tmp):
                os.remove(tmp)
            time.sleep(2.0 * (attempt + 1))
    raise RuntimeError(f"failed after {retries} attempts: {item.url}: {last}")


def fetch_all(items: Iterable[Item], out_dir: str, workers: int = 1,
              urlretrieve=urllib.request.urlretrieve) -> None:
    items = list(items)
    done = 0

    def one(it):
        status = fetch(it, out_dir, urlretrieve=urlretrieve)
        print(f"[{status}] {it.dest}")
        return status

    if workers <= 1:
        for it in items:
            one(it)
            done += 1
    else:
        with cf.ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(one, items))
    print(f"{len(items)} files processed into {out_dir}")


def build_plan(args, scans: List[str], test_scans: List[str]) -> List[Item]:
    release = "v1" if args.v1 else "v2"
    file_types = [args.type] if args.type else FILETYPES
    test_types = ([args.type] if args.type in FILETYPES_TEST else
                  [] if args.type else FILETYPES_TEST)
    items: List[Item] = []
    if args.label_map:
        return [label_map_item(release)]
    if args.preprocessed_frames:
        return [tasks_item(PREPROCESSED_FRAMES[0], release)]
    if args.test_frames_2d:
        return [tasks_item(TEST_FRAMES[0], release)]
    if args.data_efficient:
        return [tasks_item(n, release) for n in DATA_EFFICIENT]
    if args.id:
        is_test = args.id in test_scans
        if args.id not in scans and not (is_test and not args.v1):
            raise SystemExit(f"ERROR: invalid scan id {args.id}")
        types = test_types if is_test else file_types
        return scan_items(args.id, types, release, test_scan=is_test)
    for s in scans:
        items += scan_items(s, file_types, release)
    if not args.v1:
        items.append(label_map_item(release))
        for s in test_scans:
            items += scan_items(s, test_types, release, test_scan=True)
    return items


def main(argv: Optional[Sequence[str]] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-o", "--out_dir", required=True)
    ap.add_argument("--id", help="download a single scan id")
    ap.add_argument("--type", choices=FILETYPES,
                    help="restrict to one file type")
    ap.add_argument("--v1", action="store_true", help="ScanNet v1 release")
    ap.add_argument("--label-map", "--label_map", dest="label_map",
                    action="store_true")
    ap.add_argument("--preprocessed-frames", dest="preprocessed_frames",
                    action="store_true",
                    help=f"scannet_frames_25k.zip ({PREPROCESSED_FRAMES[1]})")
    ap.add_argument("--test-frames-2d", dest="test_frames_2d",
                    action="store_true",
                    help=f"2D test frames ({TEST_FRAMES[1]})")
    ap.add_argument("--data-efficient", dest="data_efficient",
                    action="store_true")
    ap.add_argument("--workers", type=int, default=1,
                    help="concurrent downloads")
    ap.add_argument("--agree-tos", action="store_true",
                    help="confirm ScanNet Terms-of-Use agreement "
                         "non-interactively")
    args = ap.parse_args(argv)

    if not args.agree_tos:
        print("ScanNet data use requires agreeing to the Terms of Use:")
        print("  " + TOS_URL)
        input("Press Enter to confirm you have agreed (Ctrl-C to abort) ")

    release = "v1" if args.v1 else "v2"
    needs_lists = args.id or not (args.label_map or args.preprocessed_frames
                                  or args.test_frames_2d
                                  or args.data_efficient)
    scans = release_scan_list(release) if needs_lists else []
    test_scans = (release_scan_list(release, test=True)
                  if needs_lists and not args.v1 else [])
    plan = build_plan(args, scans, test_scans)
    if not args.id and not args.type and len(plan) > len(DATA_EFFICIENT):
        print(f"WARNING: the full ScanNet {release} release needs "
              f"{RELEASE_SIZE}. Existing files are skipped; delete partial "
              "files to re-fetch.")
    fetch_all(plan, args.out_dir, workers=args.workers)


if __name__ == "__main__":
    main()
