"""Task/config resolution (ref runner.py:17-125, pbc_monitor.py:350-362).

The reference resolves six configured tasks with per-task parser dialects,
politeness options, and layout paths. Here a config document becomes a list
of ``TaskSpec``s that parameterize ``CrawlConfig``s — driver-side JSON, the
tasks table is broadcast-small by construction.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class HttpOptions:
    """Politeness knobs (ref runner.py:279-295; defaults delay=3, jitter=2,
    timeout=30). In the batch engine delay+jitter become the per-host
    per-round budget: budget ≈ round_duration / (delay + jitter/2)."""

    delay: float = 3.0
    jitter: float = 2.0
    timeout: float = 30.0

    def host_budget(self, round_duration_s: float) -> int:
        per_req = self.delay + self.jitter / 2.0
        return max(1, int(round_duration_s / per_req)) if per_req > 0 else 10**9


@dataclass
class TaskSpec:
    name: str
    start_url: str
    parser_dialect: str = "default"
    allowed_types: list[str] = field(default_factory=list)
    http: HttpOptions = field(default_factory=HttpOptions)


def load_tasks(config: dict | str) -> list[TaskSpec]:
    """pbc_config.json-shaped document → TaskSpecs.

    Accepted shapes (ref pbc_monitor.py:350-362): top-level ``tasks`` list
    with per-task ``name``/``url``/``parser``/``allowed_types``; top-level
    ``delay``/``jitter``/``timeout`` as defaults overridable per task."""
    data = json.loads(config) if isinstance(config, str) else config
    defaults = HttpOptions(
        delay=float(data.get("delay", 3.0)),
        jitter=float(data.get("jitter", 2.0)),
        timeout=float(data.get("timeout", 30.0)),
    )
    tasks = []
    for t in data.get("tasks", []):
        # the shipped pbc_config.json uses "start_url"; "url" kept for
        # compatibility with the compact test fixtures
        url = t.get("start_url") or t.get("url") if isinstance(t, dict) else None
        if not url:
            continue
        http = HttpOptions(
            delay=float(t.get("delay", defaults.delay)),
            jitter=float(t.get("jitter", defaults.jitter)),
            timeout=float(t.get("timeout", defaults.timeout)),
        )
        tasks.append(
            TaskSpec(
                name=str(t.get("name") or url),
                start_url=url,
                parser_dialect=_dialect_of(t.get("parser")),
                allowed_types=[str(x).lower() for x in t.get("allowed_types", [])],
                http=http,
            )
        )
    return tasks


def _dialect_of(parser_spec: object) -> str:
    """Map the reference's parser module specs (pbc_config.json values like
    'pbc_regulations.icrawler.parser_tiaofasi') onto this engine's parser
    dialects (ref runner.py parser resolution)."""
    s = str(parser_spec or "").rsplit(".", 1)[-1].lower()
    if "tiaofasi" in s:
        return "tiaofasi"
    # parser / parser_policy are both table/txtlist-shaped → default dialect
    if s in ("", "parser", "parser_policy", "policy", "default"):
        return "default"
    return s
