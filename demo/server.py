"""Static file server for the browser demo (reference ``demo/server.py``
additionally does HF auth/metering/queueing and WebRTC SDP proxying against
a load balancer — out of scope for this build).

    python demo/server.py --port 8080
    # then open http://127.0.0.1:8080 with `s2s-tpu serve` running
"""

from __future__ import annotations

import argparse
import functools
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    args = parser.parse_args()
    handler = functools.partial(SimpleHTTPRequestHandler, directory=str(Path(__file__).parent))
    server = ThreadingHTTPServer((args.host, args.port), handler)
    print(f"demo on http://{args.host}:{args.port} (server: s2s-tpu serve)")
    server.serve_forever()


if __name__ == "__main__":
    main()
