"""demo/viewer.py: the interactive query loop served over local HTTP.

Covers the L8 demo capability (reference ``demo/run_demo`` = GAPS osview +
clip_server live recoloring): points blob round-trip, per-query similarity
blob, distinct queries producing distinct heats, and error surfacing.
Text embeddings run in pseudo mode (no CLIP weights in CI)."""

import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import sys
    from os.path import dirname, join
    sys.path.insert(0, join(dirname(dirname(__file__)), "demo"))
    import viewer

    tmp = tmp_path_factory.mktemp("viewer")
    rng = np.random.default_rng(0)
    n, d = 500, 768
    coords = rng.uniform(0, 5, (n, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    feats = rng.standard_normal((n, d)).astype(np.float32)
    np.savez(tmp / "scene.npz", coords=coords, colors=colors,
             labels=np.zeros(n, np.int64))
    np.save(tmp / "feats.npy", feats)

    state = viewer.load_state(str(tmp / "scene.npz"), str(tmp / "feats.npy"),
                              "openseg", allow_pseudo=True)
    state.similarity("warmup probe")  # one-time transformers import (~30s)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), viewer.make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", n
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.read()


def test_page_and_points(server):
    base, n = server
    page = _get(base + "/").decode()
    assert "openscene_tpu viewer" in page and "/query?q=" in page
    blob = np.frombuffer(_get(base + "/points"), np.float32)
    assert blob.shape == (n * 6,)
    xyzrgb = blob.reshape(n, 6)
    assert np.isfinite(xyzrgb).all()
    assert xyzrgb[:, 3:].min() >= 0 and xyzrgb[:, 3:].max() <= 1


def test_query_similarity(server):
    base, n = server
    s1 = np.frombuffer(_get(base + "/query?q=a%20sofa"), np.float32)
    s2 = np.frombuffer(_get(base + "/query?q=a%20chair"), np.float32)
    assert s1.shape == (n,) and s2.shape == (n,)
    assert np.isfinite(s1).all() and np.abs(s1).max() <= 1.0 + 1e-5
    assert not np.allclose(s1, s2)  # distinct queries -> distinct heat


def test_empty_query_is_400(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(base + "/query?q=")
    assert ei.value.code == 400
