#!/usr/bin/env python
"""Text-embedding TCP server (reference demo/clip_server.py protocol).

Listens on localhost:1111; each connection sends a query string, the server
encodes it with the CLIP text encoder, L2-normalizes, saves
``<out_dir>/<query>.npy`` and echoes the query back — the protocol any viewer
(the reference's GAPS osview, or demo/query.py batch mode) speaks.

    python demo/clip_server.py --out_dir tmp [--port 1111]
"""

import argparse
import os
import socket
import sys
from os.path import dirname, join

sys.path.insert(0, join(dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="tmp")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=1111)
    ap.add_argument("--extractor", default="openseg")
    ap.add_argument("--allow_pseudo_text", action="store_true")
    args = ap.parse_args()

    from openscene_tpu.text import extract_text_features

    os.makedirs(args.out_dir, exist_ok=True)
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((args.host, args.port))
    srv.listen(1)
    print(f"clip_server listening on {args.host}:{args.port}")
    try:
        while True:
            conn, _ = srv.accept()
            with conn:
                query = conn.recv(1024).decode("utf-8").strip()
                if not query:
                    continue
                print("query:", query)
                emb = extract_text_features(
                    [query], extractor=args.extractor, prompt_eng=False,
                    cache_dir="", allow_pseudo=args.allow_pseudo_text)[0]
                emb = emb / (np.linalg.norm(emb) + 1e-9)
                np.save(join(args.out_dir, f"{query}.npy"), emb)
                conn.sendall(query.encode("utf-8"))
    finally:
        srv.close()


if __name__ == "__main__":
    main()
