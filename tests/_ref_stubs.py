"""Dependency shims so the reference package imports AND its parsers run.

bs4 is mapped to ``icrawler_spark.parsers.bs4compat`` — a working
BeautifulSoup facade over the repo's stdlib DOM — so the reference's actual
parser modules (parser.py, parser_tiaofasi.py) execute in-process and parity
tests can compare their output entry-for-entry against our parse UDFs.
requests/fastapi/uvicorn stay inert stubs (network/serving never runs in
parity tests); every inert stub raises on use so an accidental dependency
fails loudly.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "pbc_regulations"))


class _StubClass:
    def __init__(self, *a, **k):
        raise RuntimeError("reference stub used: dependency not available in sandbox")


def install_reference_stubs() -> None:
    if "bs4" not in sys.modules:
        from icrawler_spark.parsers import bs4compat

        bs4 = types.ModuleType("bs4")
        bs4.BeautifulSoup = bs4compat.BeautifulSoup
        bs4.NavigableString = bs4compat.NavigableString
        bs4.Tag = bs4compat.Tag
        element = types.ModuleType("bs4.element")
        element.NavigableString = bs4compat.NavigableString
        element.Tag = bs4compat.Tag
        bs4.element = element
        sys.modules["bs4"] = bs4
        sys.modules["bs4.element"] = element
    if "fastapi" not in sys.modules:
        fastapi = types.ModuleType("fastapi")
        for name in ("APIRouter", "Depends", "FastAPI", "HTTPException", "Query", "Request"):
            setattr(fastapi, name, _StubClass)
        cors = types.ModuleType("fastapi.middleware.cors")
        cors.CORSMiddleware = _StubClass
        middleware = types.ModuleType("fastapi.middleware")
        middleware.cors = cors
        responses = types.ModuleType("fastapi.responses")
        responses.JSONResponse = _StubClass
        responses.Response = _StubClass
        fastapi.middleware = middleware
        fastapi.responses = responses
        sys.modules["fastapi"] = fastapi
        sys.modules["fastapi.middleware"] = middleware
        sys.modules["fastapi.middleware.cors"] = cors
        sys.modules["fastapi.responses"] = responses
    if "uvicorn" not in sys.modules:
        sys.modules["uvicorn"] = types.ModuleType("uvicorn")
    if "requests" not in sys.modules:
        req = types.ModuleType("requests")
        req.Session = _StubClass
        req.get = _StubClass
        req.exceptions = types.SimpleNamespace(
            RequestException=Exception, Timeout=Exception, ConnectionError=Exception
        )
        sys.modules["requests"] = req
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
