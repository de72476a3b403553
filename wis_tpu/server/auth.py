"""HTTP Basic auth middleware (reference main.py:1053-1094).

Active when ``basic_auth_user`` / ``basic_auth_pass`` is configured; a
falsy user or pass skips that half of the check. **Intentional deviation
from the reference**: when BOTH are unconfigured, auth is disabled and
requests pass through — the reference still returns 401 for any request
lacking an Authorization header once its middleware is installed (it
installs the middleware only when credentials are set, main.py:1087-1094,
but would lock everyone out if installed unconfigured). Here the
middleware is always installed and gates itself on configuration instead.
Constant-time comparison via ``secrets.compare_digest``.
"""

from __future__ import annotations

import base64
import binascii
import secrets

from aiohttp import web


def basic_auth_middleware(settings):
    user = settings.basic_auth_user
    password = settings.basic_auth_pass

    @web.middleware
    async def middleware(request: web.Request, handler):
        if not user and not password:
            return await handler(request)
        header = request.headers.get("Authorization", "")
        ok = False
        if header.startswith("Basic "):
            try:
                decoded = base64.b64decode(header[6:]).decode("utf-8")
                got_user, _, got_pass = decoded.partition(":")
                ok = True
                if user:
                    ok = ok and secrets.compare_digest(got_user, user)
                if password:
                    ok = ok and secrets.compare_digest(got_pass, password)
            except (binascii.Error, UnicodeDecodeError):
                ok = False
        if not ok:
            return web.json_response(
                {"error": "Unauthorized"},
                status=401,
                headers={"WWW-Authenticate": 'Basic realm="wis"'},
            )
        return await handler(request)

    return middleware


def cors_middleware(settings):
    origins = settings.cors_allowed_origins

    @web.middleware
    async def middleware(request: web.Request, handler):
        if request.method == "OPTIONS":
            resp = web.Response(status=204)
        else:
            resp = await handler(request)
        origin = request.headers.get("Origin")
        if origin and (origins == ["*"] or origin in origins):
            resp.headers["Access-Control-Allow-Origin"] = origin
            resp.headers["Access-Control-Allow-Methods"] = "GET, POST, OPTIONS"
            resp.headers["Access-Control-Allow-Headers"] = "*"
        return resp

    return middleware
