"""Combined portal (VERDICT r3 item 4): one server, both route families,
payloads byte-equal the standalone servers' (mirror of ref
tests/test_dashboard.py + test_policy_finder_api.py through portal/cli.py's
mount scheme: dashboard at /, policy API under /api)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from icrawler_spark.crawl.export import state_json_to_tables
from icrawler_spark.dashboard_web import DashboardHTTPServer, DashboardService
from icrawler_spark.httpapi import PolicyHTTPServer
from icrawler_spark.portal import PortalHTTPServer, build_portal_services
from icrawler_spark.serve import PolicyService

_STATE_A = {
    "entries": [
        {"serial": 1, "title": "中国人民银行公告〔2023〕第3号 关于测试", "remark": "测试",
         "documents": [{"type": "html", "url": "http://x/a.html", "title": "页面"},
                       {"type": "pdf", "url": "http://x/a.pdf", "title": "正文", "downloaded": True,
                        "local_path": "downloads/a.pdf"}]},
        {"serial": 2, "title": "监管问答 2021 年度总结", "remark": "",
         "documents": [{"type": "pdf", "url": "http://x/b.pdf", "title": "通知"}]},
    ]
}
_STATE_B = {
    "entries": [
        {"serial": 1, "title": "国家法律 金融稳定法（草案）", "remark": "草案",
         "documents": [{"type": "html", "url": "http://y/law.html", "title": "法律"}]},
    ]
}


@pytest.fixture(scope="module")
def portal_setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("portal")
    dl = root / "downloads"
    dl.mkdir()
    (dl / "taska_state.json").write_text(json.dumps(_STATE_A, ensure_ascii=False), "utf-8")
    (dl / "taskb_state.json").write_text(json.dumps(_STATE_B, ensure_ascii=False), "utf-8")
    config = {
        "artifact_dir": str(root),
        "tasks": [
            {"name": "taska", "start_url": "http://x/list.html"},
            {"name": "taskb", "start_url": "http://y/list.html"},
        ],
    }
    policy, dash = build_portal_services(spark, config, artifact_dir=str(root))
    return policy, dash


def _get(base, path):
    try:
        with urllib.request.urlopen(f"{base}{path}") as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_portal_serves_both_route_families_byte_equal(portal_setup):
    """Every policy route under /api and every dashboard route at / returns
    BYTE-identical responses to the standalone servers."""
    policy, dash = portal_setup
    with PortalHTTPServer(policy, dash) as (ph, pp), \
         PolicyHTTPServer(policy) as (sh, sp), \
         DashboardHTTPServer(dash) as (dh, dp):
        portal = f"http://{ph}:{pp}"
        solo_policy = f"http://{sh}:{sp}"
        solo_dash = f"http://{dh}:{dp}"
        # policy family: /api/<route> == standalone /<route>
        for route in (
            "/search?query=%E9%87%91%E8%9E%8D%E7%A8%B3%E5%AE%9A%E6%B3%95&topk=3",
            "/policies",
            "/policies?limit=1&offset=1",
            "/policies/1",
            "/policies/999",
            "/search",           # 400 parity
            "/health",
        ):
            s1, b1 = _get(portal, f"/api{route}")
            s2, b2 = _get(solo_policy, route)
            assert (s1, b1) == (s2, b2), f"/api{route}"
        # dashboard family: portal / == standalone /
        for route in ("/api/tasks", "/healthz", "/api/tasks/entries"):
            s1, b1 = _get(portal, route)
            s2, b2 = _get(solo_dash, route)
            assert (s1, b1) == (s2, b2), route
        # HTML shells render (volatile generatedAt ⇒ status/shape only)
        for route in ("/", "/entries", "/api-explorer"):
            s, body = _get(portal, route)
            assert s == 200 and b"<html" in body.lower(), route
        # unknown /api path is a portal 404, not a dashboard fallthrough
        s, _ = _get(portal, "/api/unknown")
        assert s == 404


def test_portal_payloads_match_shim_functions(portal_setup):
    """The mounted payloads equal the shim functions' dicts (the driver
    contract the standalone tests pin), across BOTH tasks' states."""
    policy, dash = portal_setup
    with PortalHTTPServer(policy, dash) as (h, p):
        base = f"http://{h}:{p}"
        _s, body = _get(base, "/api/policies")
        assert json.loads(body) == json.loads(
            json.dumps(policy.policies_payload(None), ensure_ascii=False)
        )
        got = json.loads(body)
        assert got["result_count"] == 3  # both tasks' states unioned
        _s, body = _get(base, "/api/tasks")
        assert json.loads(body) == json.loads(json.dumps(dash.overviews(), ensure_ascii=False))
        slugs = {o["slug"] for o in json.loads(body)}
        assert len(slugs) == 2


def test_portal_post_routes_dispatch(portal_setup):
    policy, dash = portal_setup
    with PortalHTTPServer(policy, dash) as (h, p):
        req = urllib.request.Request(
            f"http://{h}:{p}/api/search",
            data=json.dumps({"query": "金融稳定法", "topk": 2}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            payload = json.loads(r.read())
        assert payload["result_count"] >= 1
        assert payload == json.loads(json.dumps(
            policy.search_payload("金融稳定法", 2, True), ensure_ascii=False))
        # POST to a dashboard path: 404 (dashboard is GET-only)
        req2 = urllib.request.Request(
            f"http://{h}:{p}/api/tasks", data=b"{}", method="POST")
        try:
            urllib.request.urlopen(req2)
            status = 200
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 404


def test_state_json_round_trip(spark):
    """state_json_to_tables ∘ state_export_json is the identity on the
    reference's serialization (loader = inverse of the exporter)."""
    from icrawler_spark.crawl.export import state_export_json

    entries, documents, seen = state_json_to_tables(spark, _STATE_A, task="t")
    out = json.loads(state_export_json(entries, documents, seen))
    assert out == _STATE_A
