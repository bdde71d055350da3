"""Offline tests for the ScanNet downloader's plan + fetch stages."""

import argparse
import importlib.util
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "download_scannet",
    os.path.join(os.path.dirname(__file__), "..", "datasets", "scannet",
                 "download_scannet.py"))
dl = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(dl)


def _args(**kw):
    base = dict(id=None, type=None, v1=False, label_map=False,
                preprocessed_frames=False, test_frames_2d=False,
                data_efficient=False)
    base.update(kw)
    return argparse.Namespace(**base)


def test_v2_sens_comes_from_v1_tree():
    items = dl.scan_items("scene0000_00", [".sens", ".txt"], "v2")
    by_ft = {i.dest.split("scene0000_00")[-1]: i for i in items}
    assert by_ft[".sens"].url.startswith(dl.BASE_URL + "v1/scans/")
    assert by_ft[".txt"].url.startswith(dl.BASE_URL + "v2/scans/")
    # test scans keep v2 .sens
    t = dl.scan_items("scene0707_00", [".sens"], "v2", test_scan=True)[0]
    assert t.url.startswith(dl.BASE_URL + "v2/scans/")
    assert t.dest.startswith(os.path.join("scans_test", "scene0707_00"))


def test_full_release_plan_covers_label_map_and_test_scans():
    plan = dl.build_plan(_args(), ["scene0000_00"], ["scene0707_00"])
    dests = [i.dest for i in plan]
    assert dl.LABEL_MAP["v2"] in dests
    assert len([d for d in dests if d.startswith("scans" + os.sep)]) == \
        len(dl.FILETYPES)
    assert len([d for d in dests if d.startswith("scans_test")]) == \
        len(dl.FILETYPES_TEST)


def test_type_filter_and_single_scan():
    plan = dl.build_plan(_args(type="_vh_clean_2.ply"),
                         ["scene0000_00", "scene0001_00"], ["scene0707_00"])
    # the label map rides along in full-release mode (reference parity)
    assert all(i.dest.endswith("_vh_clean_2.ply") for i in plan
               if i.dest != dl.LABEL_MAP["v2"])
    assert sum(i.dest != dl.LABEL_MAP["v2"] for i in plan) == 3  # 2 train + 1 test
    plan = dl.build_plan(_args(id="scene0001_00", type=".sens"),
                         ["scene0000_00", "scene0001_00"], [])
    assert [i.dest for i in plan] == [
        os.path.join("scans", "scene0001_00", "scene0001_00.sens")]
    with pytest.raises(SystemExit):
        dl.build_plan(_args(id="nope"), ["scene0000_00"], [])


def test_fetch_is_idempotent_and_atomic(tmp_path):
    calls = []

    def fake_retrieve(url, tmp):
        calls.append(url)
        with open(tmp, "w") as f:
            f.write("payload")

    item = dl.Item(url="http://x/scene.ply",
                   dest=os.path.join("scans", "s", "s.ply"))
    assert dl.fetch(item, str(tmp_path), urlretrieve=fake_retrieve) == "ok"
    assert dl.fetch(item, str(tmp_path), urlretrieve=fake_retrieve) == "skip"
    assert len(calls) == 1
    dest_dir = tmp_path / "scans" / "s"
    assert (dest_dir / "s.ply").read_text() == "payload"
    assert not [p for p in os.listdir(dest_dir) if p.endswith(".part")]


def test_fetch_retries_then_raises(tmp_path, monkeypatch):
    monkeypatch.setattr(dl.time, "sleep", lambda s: None)
    n = {"calls": 0}

    def bad_retrieve(url, tmp):
        n["calls"] += 1
        raise OSError("boom")

    item = dl.Item(url="http://x/f", dest="f")
    with pytest.raises(RuntimeError):
        dl.fetch(item, str(tmp_path), retries=3, urlretrieve=bad_retrieve)
    assert n["calls"] == 3
    assert not [p for p in os.listdir(tmp_path) if p.endswith(".part")]
