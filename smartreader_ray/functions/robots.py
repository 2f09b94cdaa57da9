"""Crawl politeness: robots.txt parsing + a distributed URL gate.

The reference's fetch stage (SmartReader.cs GetAsync) has no politeness
layer; a web-scale crawler cannot ship without one, and the HTTP leg is
the only part this container can't exercise (no network). Everything
BELOW the socket is real here:

- `parse_robots_txt`: a minimal RFC 9309 subset parser (User-agent
  groups, Allow/Disallow path prefixes, ``*`` agent) — pure function,
  unit-tested against the RFC's precedence examples.
- `robots_gate`: the distributed gate — per URL, the LONGEST matching
  rule prefix for its host wins; on an Allow/Disallow tie at equal
  length, Allow wins; no match ⇒ allowed (RFC 9309 §2.2.2). The rules
  table is host-sized (one robots file per host) and ships as ONE
  broadcast read map-side by every URL block — the small-side-lookup
  pattern, never a shuffle join.

Matching is plain string-prefix (no ``*``/``$`` wildcards — documented
subset), which is exactly what makes the gate SQL-replayable: the
oracle reproduces it with ``LIKE prefix || '%'`` + ROW_NUMBER ordered
by (prefix length DESC, allow DESC).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["parse_robots_txt", "robots_gate"]


def parse_robots_txt(text: str, agent: str = "*"):
    """Parse a robots.txt body into ``[(allow: bool, prefix: str)]``
    for ``agent`` — the group addressed to the longest user-agent token
    that is a case-insensitive prefix of ``agent`` (or ``*``). Records
    with empty paths are ignored (an empty Disallow means allow-all per
    RFC 9309). Unknown directives are skipped."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    saw_rule = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if saw_rule:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules, saw_rule = [], [], False
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            saw_rule = True
            if value:
                cur_rules.append((field == "allow", value))
        # else: unknown directive (crawl-delay, sitemap, ...) — skip
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))

    agent_l = agent.lower()
    best: tuple[int, list[tuple[bool, str]]] | None = None
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                score = 0
            elif agent_l.startswith(a):
                score = len(a)
            else:
                continue
            if best is None or score > best[0]:
                best = (score, rules)
    return best[1] if best else []


def robots_gate(urls, rules_by_host: dict, host_col: str = "host",
                path_col: str = "path"):
    """Stamp each URL row with ``allowed`` (RFC 9309 longest-prefix
    decision against its host's rules). ``rules_by_host`` maps host →
    ``[(allow, prefix)]`` (the output of `parse_robots_txt` per host) —
    host-sized by nature, broadcast once via ``ray.put``. Hosts with no
    rules (or absent) default to allowed.

    Vectorization: one ``str.startswith`` pass per (host, rule) over
    that host's URL rows — rules per host are few and fixed; URL rows
    never loop in Python. Decision key = ``2·len(prefix) + allow`` so a
    single ``np.maximum`` running max implements both precedence rules.
    """
    import ray

    ref = ray.put(rules_by_host)

    def stamp(b: pa.Table, _ref=ref) -> pa.Table:
        m = ray.get(_ref)
        host = b.column(host_col).to_pandas()
        path = b.column(path_col).to_pandas()
        allowed = np.ones(len(host), dtype=bool)
        for h, idxs in host.groupby(host, sort=False).groups.items():
            rules = m.get(h)
            if not rules:
                continue
            ii = np.asarray(idxs, dtype=np.int64)
            p = path.iloc[ii]
            best = np.full(len(ii), -1, dtype=np.int64)
            for allow, prefix in rules:
                hit = p.str.startswith(prefix).to_numpy()
                key = 2 * len(prefix) + (1 if allow else 0)
                best = np.where(hit, np.maximum(best, key), best)
            allowed[ii] = (best < 0) | (best % 2 == 1)
        return b.append_column("allowed", pa.array(allowed))

    return urls.map_batches(stamp, batch_format="pyarrow")
