"""Task/config resolution (ref runner.py defaults + overrides)."""

from icrawler_spark.config import HttpOptions, load_tasks

CONFIG = {
    "delay": 5,
    "jitter": 3,
    "tasks": [
        {"name": "zhengwugongkai", "url": "http://pbc.test/a/index.html"},
        {
            "name": "tiaofasi",
            "url": "http://pbc.test/b/index.html",
            "parser": "tiaofasi",
            "delay": 1,
            "allowed_types": ["PDF", "word"],
        },
        {"bogus": True},
    ],
}


def test_load_tasks_defaults_and_overrides():
    tasks = load_tasks(CONFIG)
    assert len(tasks) == 2  # bogus skipped
    a, b = tasks
    assert a.http.delay == 5 and a.http.jitter == 3 and a.http.timeout == 30
    assert a.parser_dialect == "default"
    assert b.http.delay == 1 and b.http.jitter == 3
    assert b.parser_dialect == "tiaofasi"
    assert b.allowed_types == ["pdf", "word"]


def test_load_tasks_from_json_string():
    tasks = load_tasks('{"tasks": [{"url": "http://x/i.html"}]}')
    assert tasks[0].name == "http://x/i.html"
    assert tasks[0].http.delay == 3.0  # code defaults (ref runner.py:284-285)


def test_host_budget_from_politeness():
    # deployed config: delay=5, jitter=3 → 6.5 s/request → 0.15 req/s
    h = HttpOptions(delay=5, jitter=3)
    assert h.host_budget(65) == 10
    assert HttpOptions(delay=0, jitter=0).host_budget(60) > 10**6
