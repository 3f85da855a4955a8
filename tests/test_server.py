"""Preview-server tests (aiohttp test client, driven via asyncio.run —
no pytest-asyncio in this image)."""

import asyncio
import os

import numpy as np
import pytest

pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from comfy3d_tpu.server import make_app  # noqa: E402


@pytest.fixture
def mesh_file(tmp_path):
    from comfy3d_tpu.core.mesh import Mesh
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    p = tmp_path / "tri.glb"
    Mesh(v=v, f=f).write(str(p))
    return str(p)


def fetch(app, path, params=None):
    async def go():
        async with TestClient(TestServer(app)) as client:
            resp = await client.get(path, params=params or {})
            body = await resp.read()
            return resp.status, body
    return asyncio.run(go())


class TestServerRoutes:
    def test_viewfile_serves_allowed(self, mesh_file):
        app = make_app(allowed_roots=[os.path.dirname(mesh_file)],
                       allow_all_ips=True)
        status, body = fetch(app, "/viewfile", {"filepath": mesh_file})
        assert status == 200
        assert body[:4] == b"glTF"

    def test_viewfile_blocks_outside_root(self, mesh_file, tmp_path):
        app = make_app(allowed_roots=[str(tmp_path / "other")],
                       allow_all_ips=True)
        status, _ = fetch(app, "/viewfile", {"filepath": mesh_file})
        assert status == 403

    def test_viewfile_blocks_extension(self, tmp_path):
        secret = tmp_path / "secret.txt"
        secret.write_text("nope")
        app = make_app(allowed_roots=[str(tmp_path)], allow_all_ips=True)
        status, _ = fetch(app, "/viewfile", {"filepath": str(secret)})
        assert status == 403

    def test_viewer_page(self):
        app = make_app(allow_all_ips=True)
        status, body = fetch(app, "/viewer")
        assert status == 200
        text = body.decode()
        assert "three" in text and "viewfile" in text

    def test_missing_file_404(self, tmp_path):
        app = make_app(allowed_roots=[str(tmp_path)], allow_all_ips=True)
        status, _ = fetch(app, "/viewfile",
                          {"filepath": str(tmp_path / "x.glb")})
        assert status == 404


def test_system_conf_role(tmp_path, monkeypatch):
    """Configs/system.conf counterpart (reference __init__.py:35-48):
    JSON config supplies the client-IP allowlist + HF token."""
    import json

    from comfy3d_tpu.server import load_system_conf

    conf = {"server": {"allowed_client_ips": ["10.0.0.5"],
                       "port": 9999},
            "huggingface": {"token": "hf_dummy"}}
    p = tmp_path / "system.json"
    p.write_text(json.dumps(conf))
    monkeypatch.setenv("COMFY3D_SYSTEM_CONF", str(p))
    monkeypatch.delenv("HF_TOKEN", raising=False)
    got = load_system_conf()
    assert got["server"]["allowed_client_ips"] == ["10.0.0.5"]
    assert got["server"]["port"] == 9999
    import os
    assert os.environ["HF_TOKEN"] == "hf_dummy"
    # absent file → empty config, no crash
    monkeypatch.setenv("COMFY3D_SYSTEM_CONF", str(tmp_path / "nope"))
    assert load_system_conf() == {}
