"""HTTP serving surface (SURVEY S5) — the reference's FastAPI endpoints
(``api/python/fastapi_server.py:20-84``) re-expressed on the stdlib
``http.server`` (FastAPI/uvicorn are not in this environment; the wire
contract, not the framework, is the parity surface):

    GET  /          -> {"service", "version", "status"}
    GET  /health    -> {"status": "healthy", "extractor_ready": true}
    POST /extract   -> body {"address": str, "detailed": bool?}
                       -> {components, overall_confidence,
                           extraction_time_ms, normalized_address,
                           original_address, metadata?}

Run::

    python -m ai_bangladesh_address_parser_ray.server [--port 8000]

Serving model: one process-global kernel (the reference holds one
ProductionAddressExtractor per process), ThreadingHTTPServer for
concurrency — the kernel is pure and stateless per call, so threads are
safe. This surface is for interactive/point lookups; batch workloads
belong to the Ray pipeline (``__main__ --batch`` / ``--linkage``), and a
production deployment would put N replicas of THIS process behind a load
balancer (or Ray Serve, not available here) rather than fattening one.
"""

from __future__ import annotations

import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

SERVICE_INFO = {
    "service": "Bangladesh Address Extractor (Ray Data re-expression)",
    "version": "1.0.0",
    "status": "ready",
}


def _extract_payload(address: str, detailed: bool) -> dict:
    from .kernel.extract import extract
    t0 = time.perf_counter()
    res = extract(address, detailed=detailed)
    ms = (time.perf_counter() - t0) * 1000.0
    out = {
        "components": res.get("components", {}),
        "overall_confidence": res.get("overall_confidence", 0.0),
        "extraction_time_ms": round(ms, 3),
        "normalized_address": res.get("normalized_address", ""),
        "original_address": address,
    }
    if detailed and "metadata" in res:
        out["metadata"] = res["metadata"]
    return out


class _Handler(BaseHTTPRequestHandler):
    server_version = "abap-ray/1.0"

    def _send(self, code: int, obj: dict) -> None:
        body = json.dumps(obj, ensure_ascii=False).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        # the reference enables permissive CORS; mirror it
        self.send_header("Access-Control-Allow-Origin", "*")
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:                      # noqa: N802 (stdlib API)
        if self.path == "/":
            self._send(200, SERVICE_INFO)
        elif self.path == "/health":
            self._send(200, {"status": "healthy", "extractor_ready": True})
        else:
            self._send(404, {"error": f"not found: {self.path}"})

    def do_POST(self) -> None:                     # noqa: N802
        if self.path != "/extract":
            self._send(404, {"error": f"not found: {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length") or 0)
            req = json.loads(self.rfile.read(length) or b"{}")
            address = req.get("address")
            if not isinstance(address, str):
                self._send(422, {"error": "field 'address' (str) required"})
                return
            self._send(200, _extract_payload(
                address, bool(req.get("detailed", False))))
        except json.JSONDecodeError as e:
            self._send(400, {"error": f"invalid JSON body: {e}"})
        except Exception as e:                     # noqa: BLE001
            self._send(500, {"error": str(e)})

    def log_message(self, fmt, *args):             # quiet by default
        pass


def make_server(host: str = "127.0.0.1",
                port: int = 0) -> Tuple[ThreadingHTTPServer, int]:
    """Build (not start) the server; port 0 picks a free port. Returns
    (server, bound_port). Separated from `serve` so tests can run it on
    a background thread and shut it down."""
    # warm the kernel once per process (the reference constructs its
    # extractor at import); first request must not pay pattern compilation
    _extract_payload("", False)
    srv = ThreadingHTTPServer((host, port), _Handler)
    return srv, srv.server_address[1]


def serve(host: str = "0.0.0.0", port: int = 8000) -> None:
    srv, bound = make_server(host, port)
    print(f"serving on http://{host}:{bound}", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


def main(argv: Optional[list] = None) -> int:
    import argparse
    p = argparse.ArgumentParser(prog="ai_bangladesh_address_parser_ray.server")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    a = p.parse_args(argv)
    serve(a.host, a.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
