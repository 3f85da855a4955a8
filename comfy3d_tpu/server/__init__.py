"""Preview web server: /viewer UI + /viewfile asset route.

Counterpart of the reference webserver (`webserver/server.py:26-38`
aiohttp `/viewfile` with client-IP + extension allowlists) plus the
viewer page itself (the reference injects an iframe widget into ComfyUI,
`web/visualization.js:119-163`; standalone here, the viewer is a page).
"""

from __future__ import annotations

import ipaddress
import os
from typing import Iterable

from aiohttp import web

WEB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "web")
ALLOWED_EXTENSIONS = (".obj", ".mtl", ".ply", ".glb", ".gltf", ".splat",
                      ".png", ".jpg", ".jpeg")


def load_system_conf(path: str | None = None) -> dict:
    """The reference's `Configs/system.conf` role (pyhocon parsed at
    `__init__.py:35-48`: web-client IP allowlist + HF token) as plain
    JSON: looked up at $COMFY3D_SYSTEM_CONF, else ./Configs/system.json.

    Recognized keys: `server.allowed_client_ips`, `server.allowed_roots`,
    `server.allow_all_ips`, `server.host`, `server.port`,
    `huggingface.token` (exported to HF_TOKEN for the checkpoint
    downloaders' resume paths)."""
    import json
    path = path or os.environ.get(
        "COMFY3D_SYSTEM_CONF",
        os.path.join(os.getcwd(), "Configs", "system.json"))
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        conf = json.load(f)
    token = (conf.get("huggingface") or {}).get("token")
    if token:
        os.environ.setdefault("HF_TOKEN", token)
    return conf


def make_app(allowed_roots: Iterable[str] = ("/",),
             allowed_client_ips: Iterable[str] = ("127.0.0.1", "::1"),
             allow_all_ips: bool = False) -> web.Application:
    roots = [os.path.abspath(r) for r in allowed_roots]
    allow = set(allowed_client_ips)

    def client_ok(request) -> bool:
        if allow_all_ips:
            return True
        peer = request.remote or ""
        try:
            ip = ipaddress.ip_address(peer)
        except ValueError:
            return False
        return str(ip) in allow or ip.is_loopback

    async def viewfile(request):
        if not client_ok(request):
            raise web.HTTPForbidden(text="client not allowed")
        filepath = request.query.get("filepath", "")
        path = os.path.abspath(filepath)
        ext = os.path.splitext(path)[1].lower()
        if ext not in ALLOWED_EXTENSIONS:
            raise web.HTTPForbidden(text=f"extension {ext} not allowed")
        if not any(path.startswith(r + os.sep) or path == r
                   for r in roots):
            raise web.HTTPForbidden(text="path outside allowed roots")
        if not os.path.isfile(path):
            raise web.HTTPNotFound(text=filepath)
        return web.FileResponse(path)

    async def viewer(request):
        if not client_ok(request):
            raise web.HTTPForbidden(text="client not allowed")
        return web.FileResponse(os.path.join(WEB_DIR, "viewer.html"))

    app = web.Application()
    app.router.add_get("/viewfile", viewfile)
    app.router.add_get("/viewer", viewer)
    app.router.add_get("/", viewer)
    return app


def serve(host: str = "127.0.0.1", port: int = 8189,
          allowed_roots: Iterable[str] = ("/",), **kw) -> None:
    """Blocking entry point: `python -m comfy3d_tpu.server`.
    `Configs/system.json` (or $COMFY3D_SYSTEM_CONF) overrides defaults
    the reference reads from system.conf."""
    srv = load_system_conf().get("server") or {}
    host = srv.get("host", host)
    port = int(srv.get("port", port))
    if "allowed_client_ips" in srv and "allowed_client_ips" not in kw:
        kw["allowed_client_ips"] = tuple(srv["allowed_client_ips"])
    if "allow_all_ips" in srv and "allow_all_ips" not in kw:
        kw["allow_all_ips"] = bool(srv["allow_all_ips"])
    if "allowed_roots" in srv:
        allowed_roots = tuple(srv["allowed_roots"])
    web.run_app(make_app(allowed_roots=allowed_roots, **kw),
                host=host, port=port)
