"""Inert bs4/requests stubs so the reference package imports in this sandbox.

The reference's crawler/parser modules import bs4 and requests at module
scope; the code paths the parity tests exercise (PBCState dict logic,
policy_finder pure scoring, export_titles planning) never call into them.
Every stub raises on use, so an accidental dependency fails loudly.
"""

from __future__ import annotations

import sys
import types


class _StubClass:
    def __init__(self, *a, **k):
        raise RuntimeError("reference stub used: dependency not available in sandbox")


def install_reference_stubs() -> None:
    if "bs4" not in sys.modules:
        bs4 = types.ModuleType("bs4")
        bs4.BeautifulSoup = _StubClass
        bs4.NavigableString = _StubClass
        bs4.Tag = _StubClass
        element = types.ModuleType("bs4.element")
        element.NavigableString = _StubClass
        element.Tag = _StubClass
        bs4.element = element
        sys.modules["bs4"] = bs4
        sys.modules["bs4.element"] = element
    if "requests" not in sys.modules:
        req = types.ModuleType("requests")
        req.Session = _StubClass
        req.get = _StubClass
        req.exceptions = types.SimpleNamespace(
            RequestException=Exception, Timeout=Exception, ConnectionError=Exception
        )
        sys.modules["requests"] = req
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
