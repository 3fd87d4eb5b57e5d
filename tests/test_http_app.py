"""The stdlib HTTP app (SURVEY C13 frontend) serves the decompose flow
end-to-end: page loads, a posted image comes back as 6 base64 PNG maps."""

import base64
import io
import json
import threading
from http.server import HTTPServer

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    import jax

    from unirenderer_tpu.core import config
    from unirenderer_tpu.eval.app import AppBackend
    from unirenderer_tpu.eval.http_app import make_handler
    from unirenderer_tpu.pipelines import UniRendererPipeline

    pipe = UniRendererPipeline.create(config.tiny(), jax.random.key(0))
    backend = AppBackend(pipe, steps=2, ensemble=1)
    srv = HTTPServer(("127.0.0.1", 0), make_handler(backend))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _png_b64(arr_u8):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_page_and_decompose(server):
    import http.client

    conn = http.client.HTTPConnection(server, timeout=600)
    conn.request("GET", "/")
    page = conn.getresponse().read().decode()
    assert "Decompose" in page and "Relight" in page

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
    body = json.dumps({"image": _png_b64(img), "mask": None,
                       "box": "4,4,20,20", "env": None})
    conn.request("POST", "/api/decompose", body,
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    assert resp.status == 200, out
    assert set(out["maps"]) == {"albedo", "normal", "metallic",
                                "roughness", "spec_light", "diff_light"}
    from PIL import Image
    first = Image.open(io.BytesIO(base64.b64decode(out["maps"]["albedo"])))
    assert first.size[0] == first.size[1]


def test_error_surfaces_as_json(server):
    import http.client

    conn = http.client.HTTPConnection(server, timeout=60)
    conn.request("POST", "/api/decompose", json.dumps({"image": None}),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    assert resp.status == 500 and "no input image" in out["error"]
