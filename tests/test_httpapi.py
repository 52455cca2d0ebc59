"""HTTP boundary tests: the stdlib server must serve byte-identical payloads
to the PolicyService shim functions (VERDICT r2 item 8 — the reference's
primary entry point, ref searcher/api_server.py create_app, end-to-end
servable without fastapi). Route/param/error cases mirror
ref tests/test_policy_finder_api.py:210-344."""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from icrawler_spark.httpapi import PolicyHTTPServer

from tests.test_serve_runner import _TEXT, service  # noqa: F401 — fixture reuse


@pytest.fixture(scope="module")
def server(service):  # noqa: F811
    srv = PolicyHTTPServer(service)
    host, port = srv.start()
    yield f"http://{host}:{port}"
    srv.stop()


def _get(base, path):
    try:
        with urllib.request.urlopen(base + path, timeout=30) as resp:
            return resp.status, json.loads(resp.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode("utf-8"))


def _post(base, path, body: bytes):
    req = urllib.request.Request(
        base + path, data=body, headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode("utf-8"))


def _q(s):
    return urllib.parse.quote(s)


def test_root_and_health(server):
    status, body = _get(server, "/")
    assert status == 200 and body["service"] == "policy_finder"
    for path in ("/health", "/healthz", "/ping"):
        assert _get(server, path) == (200, {"status": "ok"})


def test_search_get_byte_equals_shim(server, service):  # noqa: F811
    status, body = _get(server, f"/search?query={_q('人民银行公告')}&topk=2")
    assert status == 200
    want = service.search_payload("人民银行公告", 2, True)
    assert json.dumps(body, ensure_ascii=False, sort_keys=True) == json.dumps(
        want, ensure_ascii=False, sort_keys=True
    )
    assert body["results"][0]["title"].startswith("中国人民银行公告")


def test_search_post_and_param_coercion(server, service):  # noqa: F811
    payload = {"q": "金融稳定法", "topk": "3", "documents": "false"}
    status, body = _post(server, "/search", json.dumps(payload).encode())
    assert status == 200
    want = service.search_payload("金融稳定法", 3, False)
    assert body == json.loads(json.dumps(want, ensure_ascii=False))
    assert all("documents" not in r for r in body["results"])


def test_search_errors_mirror_reference(server):
    # ref api_server.py:506-516: missing query / invalid topk → 400 {"error": msg}
    assert _get(server, "/search") == (400, {"error": "Missing 'query' parameter"})
    status, body = _get(server, f"/search?query=x&topk=abc")
    assert (status, body) == (400, {"error": "Invalid 'topk' parameter"})
    assert _post(server, "/search", b"") == (400, {"error": "Empty request body"})
    assert _post(server, "/search", b"not json") == (
        400,
        {"error": "Request body must be valid JSON"},
    )
    assert _post(server, "/search", b"[1,2]") == (
        400,
        {"error": "Request body must be a JSON object"},
    )
    assert _post(server, "/search", b"{}") == (400, {"error": "Field 'query' is required"})


def test_policies_routes_byte_equal_shim(server, service):  # noqa: F811
    status, body = _get(server, "/policies")
    assert status == 200
    want = service.policies_payload(None)
    assert body == json.loads(json.dumps(want, ensure_ascii=False))
    assert body["result_count"] == len(body["policies"])

    status, body = _get(server, f"/policies?query={_q('银行卡')}")
    assert status == 200 and body["query"] == "银行卡"

    status, body = _get(server, "/policies/4?include=text&include=outline")
    assert status == 200
    want = service.policy_payload("4", include=["text", "outline"])
    assert body == json.loads(json.dumps(want, ensure_ascii=False))
    assert "外包管理" in body["text"] and body["outline"]

    # ref raises HTTPException(404, detail="policy_not_found")
    assert _get(server, "/policies/999") == (404, {"detail": "policy_not_found"})


def test_clause_routes(server, service):  # noqa: F811
    path = f"/clause?title={_q('中国人民银行关于加强银行卡收单业务外包管理的通知')}&clause={_q('第二条')}"
    status, body = _get(server, path)
    assert status == 200
    want = service.clause_payload("中国人民银行关于加强银行卡收单业务外包管理的通知", "第二条")
    assert body == json.loads(json.dumps(want, ensure_ascii=False))

    assert _get(server, "/clause?title=x") == (
        400,
        {"error": "Parameters 'title' and 'item' (or 'clause') are required"},
    )
    status, body = _post(
        server, "/clause", json.dumps({"policy": "不存在的规定", "item": "第一条"}).encode()
    )
    assert status == 404

    assert _post(server, "/clause", json.dumps({"title": "x"}).encode()) == (
        400,
        {"error": "Fields 'title' and 'item' (or 'clause') are required"},
    )


def test_options_and_unknown_route(server):
    req = urllib.request.Request(server + "/search", method="OPTIONS")
    with urllib.request.urlopen(req, timeout=30) as resp:
        assert resp.status == 204
    assert _get(server, "/nope")[0] == 404


def test_concurrent_requests(server):
    """ThreadingHTTPServer + shared cached index: parallel requests must all
    succeed (the reference runs uvicorn with one shared PolicyFinder)."""
    import concurrent.futures

    paths = [f"/search?q={_q('人民银行')}&topk=1", "/policies", "/health"] * 4
    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(lambda p: _get(server, p)[0], paths))
    assert results == [200] * len(paths)
