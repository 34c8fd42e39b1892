"""HTTP serving surface tests (SURVEY S5): same endpoints/wire contract as
the reference's FastAPI server (`api/python/fastapi_server.py:20-84`),
driven over a real localhost socket."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from ai_bangladesh_address_parser_ray.server import make_server


@pytest.fixture(scope="module")
def server_url():
    srv, port = make_server("127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


class TestServer:
    def test_root(self, server_url):
        with urllib.request.urlopen(server_url + "/", timeout=30) as r:
            body = json.loads(r.read())
        assert r.status == 200 and body["status"] == "ready"

    def test_health(self, server_url):
        with urllib.request.urlopen(server_url + "/health", timeout=30) as r:
            body = json.loads(r.read())
        assert body == {"status": "healthy", "extractor_ready": True}

    def test_extract(self, server_url):
        code, body = _post(server_url + "/extract",
                           {"address": "House 12, Road 5, Dhanmondi, "
                                       "Dhaka-1209"})
        assert code == 200
        assert body["components"]["area"] == "Dhanmondi"
        assert body["components"]["postal_code"] == "1209"
        assert body["original_address"].startswith("House 12")
        assert "metadata" not in body

    def test_extract_detailed(self, server_url):
        code, body = _post(server_url + "/extract",
                           {"address": "Banani, Dhaka", "detailed": True})
        assert code == 200 and "metadata" in body

    def test_extract_missing_address_422(self, server_url):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server_url + "/extract", {"detailed": True})
        assert e.value.code == 422

    def test_bad_json_400(self, server_url):
        req = urllib.request.Request(
            server_url + "/extract", data=b"{not json", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400

    def test_unknown_path_404(self, server_url):
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(server_url + "/nope", timeout=30)
        assert e.value.code == 404

    def test_concurrent_requests(self, server_url):
        results = []

        def hit():
            results.append(_post(server_url + "/extract",
                                 {"address": "Gulshan 2, Dhaka-1212"})[1])
        threads = [threading.Thread(target=hit) for _ in range(8)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert len(results) == 8
        assert all(r["components"]["area"] == "Gulshan" for r in results)
