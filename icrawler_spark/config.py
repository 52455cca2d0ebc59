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
        if not isinstance(t, dict) or not t.get("url"):
            continue
        http = HttpOptions(
            delay=float(t.get("delay", defaults.delay)),
            jitter=float(t.get("jitter", defaults.jitter)),
            timeout=float(t.get("timeout", defaults.timeout)),
        )
        tasks.append(
            TaskSpec(
                name=str(t.get("name") or t["url"]),
                start_url=t["url"],
                parser_dialect=str(t.get("parser") or "default"),
                allowed_types=[str(x).lower() for x in t.get("allowed_types", [])],
                http=http,
            )
        )
    return tasks
