#!/usr/bin/env python
"""Interactive open-vocabulary scene viewer (browser, zero dependencies).

Replaces the reference demo's live loop — GAPS ``osview`` rendering a scene
while ``demo/clip_server.py`` answers text->CLIP queries over a socket
(reference ``demo/run_demo:5``, ``demo/clip_server.py``) — with a single
local HTTP server and a vanilla-JS canvas renderer (no CDN, works offline):

    python demo/viewer.py --features out/saved_feature/scene0_feat.npy \
        --points scene0.npz [--port 8000] [--allow_pseudo_text]

then open http://localhost:8000 and type queries ("a sofa in a scene");
each query recolors the cloud with cosine-similarity heat, exactly the
computation of demo/query.py (which remains the batch/PLY exporter).

Endpoints:
  GET /         the embedded viewer page
  GET /points   float32 binary blob: [N, x y z r g b] (decimated)
  GET /query?q= float32 binary blob: [N] similarity (same decimation)
"""

import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from os.path import dirname, join
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, join(dirname(__file__), ".."))

import numpy as np

_PAGE = """<!doctype html>
<meta charset="utf-8"><title>openscene_tpu viewer</title>
<style>
 body{margin:0;background:#111;color:#ddd;font:14px system-ui}
 #bar{position:fixed;top:0;left:0;right:0;padding:8px;background:#222c}
 #q{width:40%;padding:4px;background:#333;color:#eee;border:1px solid #555}
 #s{margin-left:8px;color:#8c8}
 canvas{display:block}
</style>
<div id="bar">
 <input id="q" placeholder="type a query, e.g. 'a sofa in a scene' — Enter">
 <span id="s">loading points…</span>
</div>
<canvas id="c"></canvas>
<script>
const cv=document.getElementById('c'),st=document.getElementById('s');
let W,H,ctx; function rs(){W=cv.width=innerWidth;H=cv.height=innerHeight;
 ctx=cv.getContext('2d');} rs(); onresize=rs;
let P=null,C=null,N=0,heat=null;
let ax=-1.0,az=0.6,zoom=1.0,cx=0,cy=0,cz=0,scale=1;
fetch('/points').then(r=>r.arrayBuffer()).then(b=>{
 const f=new Float32Array(b);N=f.length/6;P=new Float32Array(N*3);
 C=new Uint8ClampedArray(N*3);
 let mn=[1e9,1e9,1e9],mx=[-1e9,-1e9,-1e9];
 for(let i=0;i<N;i++){for(let d=0;d<3;d++){const v=f[i*6+d];P[i*3+d]=v;
  if(v<mn[d])mn[d]=v; if(v>mx[d])mx[d]=v;}
  for(let d=0;d<3;d++)C[i*3+d]=255*f[i*6+3+d];}
 cx=(mn[0]+mx[0])/2;cy=(mn[1]+mx[1])/2;cz=(mn[2]+mx[2])/2;
 scale=1.5/Math.max(mx[0]-mn[0],mx[1]-mn[1],mx[2]-mn[2]);
 st.textContent=N+' points — drag to orbit, wheel to zoom';draw();});
function draw(){
 if(!P)return; const img=ctx.createImageData(W,H),d=img.data;
 const ca=Math.cos(ax),sa=Math.sin(ax),cb=Math.cos(az),sb=Math.sin(az);
 const s=Math.min(W,H)*scale*zoom;
 for(let i=0;i<N;i++){
  let x=P[i*3]-cx,y=P[i*3+1]-cy,z=P[i*3+2]-cz;
  let x1=x*cb-y*sb, y1=x*sb+y*cb;           // yaw about z
  let y2=y1*ca-z*sa, z2=y1*sa+z*ca;         // pitch about x
  const px=(x1*s+W/2)|0, py=(H/2-z2*s)|0;
  if(px<0||py<0||px>=W||py>=H)continue;
  const o=(py*W+px)*4;
  let r,g,b;
  if(heat){const h=heat[i];r=255*h;g=255*(0.2+0.3*h*(1-h));b=255*(1-h);}
  else{r=C[i*3];g=C[i*3+1];b=C[i*3+2];}
  d[o]=r;d[o+1]=g;d[o+2]=b;d[o+3]=255;}
 ctx.putImageData(img,0,0);}
let drag=false,lx=0,ly=0;
cv.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY};
onmouseup=()=>drag=false;
onmousemove=e=>{if(!drag)return;az+=(e.clientX-lx)*0.008;
 ax+=(e.clientY-ly)*0.008;lx=e.clientX;ly=e.clientY;draw();};
cv.onwheel=e=>{zoom*=e.deltaY<0?1.1:0.9;draw();e.preventDefault();};
document.getElementById('q').onkeydown=e=>{
 if(e.key!=='Enter')return; const q=e.target.value.trim(); if(!q)return;
 st.textContent='querying…';
 fetch('/query?q='+encodeURIComponent(q)).then(r=>{
  if(!r.ok)return r.text().then(t=>{st.textContent='error: '+t});
  return r.arrayBuffer().then(b=>{const sim=new Float32Array(b);
   let mn=1e9,mx=-1e9;for(const v of sim){if(v<mn)mn=v;if(v>mx)mx=v;}
   heat=new Float32Array(N);
   for(let i=0;i<N;i++)heat[i]=(sim[i]-mn)/(mx-mn+1e-9);
   st.textContent='"'+q+'" — red = similar (range '+mn.toFixed(3)+
                  '…'+mx.toFixed(3)+')';draw();});});};
</script>
"""


class _State:
    def __init__(self, coords, colors, feats, extractor, allow_pseudo):
        self.coords = coords
        self.colors = colors
        fn = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-9)
        self.feats_n = fn.astype(np.float32)
        self.extractor = extractor
        self.allow_pseudo = allow_pseudo
        self.lock = threading.Lock()
        xyzrgb = np.concatenate([coords, colors], axis=1).astype(np.float32)
        self.blob = np.ascontiguousarray(xyzrgb).tobytes()

    def similarity(self, query: str) -> np.ndarray:
        from openscene_tpu.text import extract_text_features
        with self.lock:  # CLIP extraction is not re-entrant on 1 core
            emb = extract_text_features(
                [query], extractor=self.extractor, prompt_eng=False,
                cache_dir="", allow_pseudo=self.allow_pseudo)[0]
        return (self.feats_n @ emb.astype(np.float32)).astype(np.float32)


def make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body, ctype="application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                self._send(200, _PAGE.encode(), "text/html; charset=utf-8")
            elif u.path == "/points":
                self._send(200, state.blob)
            elif u.path == "/query":
                q = parse_qs(u.query).get("q", [""])[0]
                if not q:
                    self._send(400, b"empty query", "text/plain")
                    return
                try:
                    sim = state.similarity(q)
                except Exception as e:  # pseudo-cache refusal, no CLIP, ...
                    self._send(500, str(e).encode(), "text/plain")
                    return
                self._send(200, np.ascontiguousarray(sim).tobytes())
            else:
                self._send(404, b"not found", "text/plain")

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def load_state(points_path, features_path, extractor, allow_pseudo,
               max_points=200_000, seed=0):
    from openscene_tpu.data.scene_io import load_scene

    feats = np.load(features_path).astype(np.float32)
    coords, colors, _ = load_scene(points_path)
    assert len(coords) == len(feats), (len(coords), len(feats))
    if colors is None:
        colors = np.full((len(coords), 3), 0.7, np.float32)
    colors = np.asarray(colors, np.float32)
    if colors.max() > 1.5:  # 0..255 -> 0..1
        colors = colors / 255.0
    elif colors.min() < -0.01:  # [-1,1] -> 0..1
        colors = (colors + 1.0) / 2.0
    if len(coords) > max_points:  # decimate for the canvas renderer
        sel = np.random.default_rng(seed).choice(
            len(coords), max_points, replace=False)
        sel.sort()
        coords, colors, feats = coords[sel], colors[sel], feats[sel]
    return _State(coords.astype(np.float32), colors, feats, extractor,
                  allow_pseudo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--features", required=True,
                    help=".npy per-point feature matrix (N, D)")
    ap.add_argument("--points", required=True,
                    help="scene file (.npz/.pth) with matching point coords")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--extractor", default="openseg")
    ap.add_argument("--max_points", type=int, default=200_000)
    ap.add_argument("--allow_pseudo_text", action="store_true")
    args = ap.parse_args()

    state = load_state(args.points, args.features, args.extractor,
                       args.allow_pseudo_text, args.max_points)
    state.similarity("warmup probe")  # pay the CLIP/transformers load once,
    # before serving — keeps interactive queries sub-second
    srv = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(state))
    print(f"viewer: http://localhost:{args.port}  "
          f"({len(state.coords)} points)", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
