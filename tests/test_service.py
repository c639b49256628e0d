"""HTTP service tests: drive the reference-parity endpoints end-to-end
(upload -> preprocessing -> sparse -> artifact download + SSE events)."""

import io
import json
import time
import urllib.request

import numpy as np
import pytest
from PIL import Image

from tpusfm.pipeline.config import config_from_overrides
from tpusfm.service.http_server import start_background
from tpusfm.utils.synth_render import render_orbit_images


def _get(port, path, timeout=10):
    with urllib.request.urlopen(f"http://localhost:{port}{path}", timeout=timeout) as r:
        return r.status, r.read()


def _post_multipart(port, path, files, timeout=30):
    boundary = "testboundary123"
    body = io.BytesIO()
    for name, data in files:
        body.write(f"--{boundary}\r\n".encode())
        body.write(
            f'Content-Disposition: form-data; name="file"; filename="{name}"\r\n'
            "Content-Type: application/octet-stream\r\n\r\n".encode()
        )
        body.write(data)
        body.write(b"\r\n")
    body.write(f"--{boundary}--\r\n".encode())
    req = urllib.request.Request(
        f"http://localhost:{port}{path}", data=body.getvalue(),
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read()


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    ws = tmp_path_factory.mktemp("svc_ws")
    cfg = config_from_overrides(**{
        "sift.n_octaves": 3, "sift.max_per_octave": 512, "sift.max_features": 768,
        "matching.pair_chunk": 16, "filter.max_iterations": 128, "feature_batch": 3,
        "focal_prior_px": 0.9 * 320,
    })
    httpd, state, port = start_background(str(ws), cfg)
    yield ws, state, port
    httpd.shutdown()


def test_root_and_status(service):
    _, _, port = service
    code, body = _get(port, "/")
    assert code == 200
    assert "/sparse" in json.loads(body)["endpoints"]
    code, body = _get(port, "/status")
    assert code == 200 and json.loads(body)["busy"] is None


def test_upload_then_sparse_end_to_end(service):
    ws, state, port = service
    images, gt = render_orbit_images(
        n_views=6, img_h=240, img_w=320, focal=0.9 * 320, arc_deg=60.0, seed=1
    )
    files = []
    for i, img in enumerate(images):
        buf = io.BytesIO()
        Image.fromarray((img * 255).astype(np.uint8)).save(buf, format="PNG")
        files.append((f"view_{i:03d}.png", buf.getvalue()))
    code, body = _post_multipart(port, "/upload", files)
    assert code == 200
    assert len(json.loads(body)["saved"]) == 6
    assert len(list((ws / "images").iterdir())) == 6

    code, body = _get(port, "/sparse")
    assert code == 200
    assert json.loads(body)["result"] == "/files/colorized.ply"

    # Concurrent stage trigger is rejected while busy (parity with the
    # reference's single worker).
    code2, _ = urllib_status(port, "/sparse")
    assert code2 in (200, 409)  # 409 unless the stage just finished

    # Wait for completion via /status.
    deadline = time.time() + 600
    while time.time() < deadline:
        _, body = _get(port, "/status")
        st = json.loads(body)
        if st["busy"] is None:
            break
        time.sleep(2)
    assert st["busy"] is None
    assert st["error"] is None, st
    assert "colorized.ply" in st["artifacts"]
    assert "scene.npz" in st["artifacts"]
    # COLMAP interchange model written alongside (DenseBuilder::save parity).
    assert (ws / "colmap" / "cameras.txt").exists()
    assert (ws / "colmap" / "images.txt").exists()
    assert (ws / "colmap" / "points3D.txt").exists()

    # Artifact download.
    code, data = _get(port, "/files/colorized.ply")
    assert code == 200 and data.startswith(b"ply")

    # SSE events were published for the stages.
    types = {e.type for e in state.bus.history}
    assert {"preprocessing", "matching", "reconstruction", "done"} <= types

    # Path traversal is refused.
    code, _ = urllib_status(port, "/files/../../etc/passwd")
    assert code == 404


def urllib_status(port, path):
    try:
        with urllib.request.urlopen(f"http://localhost:{port}{path}", timeout=10) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, b""


def test_upload_binary_payload_exact(service):
    """Multipart parsing must preserve payloads byte-exact — including
    trailing CR/LF/'-' bytes that a naive delimiter rstrip would eat
    (RFC 2046: the delimiter's leading CRLF belongs to the framing)."""
    ws, state, port = service
    payload = bytes(range(256)) * 3 + b"\r\n-" + b"\x2d\x0d\x0a"
    code, body = _post_multipart(port, "/upload", [("tricky.bin", payload)])
    assert code == 200
    assert json.loads(body)["saved"] == ["tricky.bin"]
    assert (ws / "images" / "tricky.bin").read_bytes() == payload
    (ws / "images" / "tricky.bin").unlink()
