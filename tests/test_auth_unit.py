"""Auth middleware unit tests (reference main.py:1053-1094 semantics)."""

import asyncio
import base64

import pytest
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from wis_tpu.server.auth import basic_auth_middleware, cors_middleware
from wis_tpu.settings import APISettings


def _app(settings):
    async def ok(request):
        return web.json_response({"ok": True})

    app = web.Application(
        middlewares=[cors_middleware(settings), basic_auth_middleware(settings)]
    )
    app.router.add_get("/x", ok)
    return app


def _run(settings, coro_factory):
    async def runner():
        client = TestClient(TestServer(_app(settings)))
        await client.start_server()
        try:
            return await coro_factory(client)
        finally:
            await client.close()

    return asyncio.run(runner())


def test_no_auth_configured_passes():
    async def go(client):
        resp = await client.get("/x")
        assert resp.status == 200

    _run(APISettings(), go)


def test_bad_base64_rejected():
    async def go(client):
        resp = await client.get("/x", headers={"Authorization": "Basic !!!notb64"})
        assert resp.status == 401
        assert "WWW-Authenticate" in resp.headers

    _run(APISettings(basic_auth_user="u", basic_auth_pass="p"), go)


def test_wrong_password_rejected():
    async def go(client):
        tok = base64.b64encode(b"u:wrong").decode()
        resp = await client.get("/x", headers={"Authorization": f"Basic {tok}"})
        assert resp.status == 401

    _run(APISettings(basic_auth_user="u", basic_auth_pass="p"), go)


def test_user_only_check():
    """Falsy pass → only the username is verified (reference semantics)."""
    async def go(client):
        tok = base64.b64encode(b"u:anything").decode()
        resp = await client.get("/x", headers={"Authorization": f"Basic {tok}"})
        assert resp.status == 200

    _run(APISettings(basic_auth_user="u", basic_auth_pass=None), go)


def test_cors_headers():
    async def go(client):
        resp = await client.get("/x", headers={"Origin": "https://a.example"})
        assert resp.headers.get("Access-Control-Allow-Origin") == "https://a.example"
        resp = await client.options("/x", headers={"Origin": "https://a.example"})
        assert resp.status == 204

    _run(APISettings(cors_allowed_origins=["*"]), go)


def test_replica_pool_least_loaded():
    from wis_tpu.parallel.replicas import ReplicaPool

    class FakeExec:
        def __init__(self, depth):
            self._d = depth
            self.got = 0

        @property
        def queue_depth(self):
            return self._d

        def submit(self, req):
            self.got += 1
            return "future"

    pool = ReplicaPool.__new__(ReplicaPool)
    import itertools

    pool.executors = [FakeExec(5), FakeExec(0), FakeExec(2)]
    pool._rr = itertools.count()
    assert pool.submit(None) == "future"
    assert pool.executors[1].got == 1  # least-loaded won
