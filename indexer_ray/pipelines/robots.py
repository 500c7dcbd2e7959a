"""robots.txt evaluation over a crawl corpus — the compliance/politeness
filter every web-scale ingestion runs before keeping a page (the crawl
side of the reference's skip rules: lib.rs:158-179 prunes paths at
discovery; this prunes by the PUBLISHED exclusion protocol instead).

From-spec per RFC 9309 (Robots Exclusion Protocol), stdlib only:
 - groups: consecutive `User-agent:` lines share the following
   Allow/Disallow rules; later groups for the same agent merge (§2.2.1);
 - agent selection: case-insensitive product-token match, else the `*`
   group; no group -> everything allowed (§2.2.1);
 - rule matching: rules match as path prefixes with `*` (any sequence)
   and `$` (end anchor) metacharacters (§2.2.3); percent-encoding is
   compared literally (both sides of this repo's oracle synthesize
   unencoded paths);
 - decision: the MOST SPECIFIC match wins — longest rule octet-length;
   Allow wins a length tie (§2.3.2); no match or empty-pattern
   `Disallow:` -> allowed;
 - unknown directives and comment tails (`# ...`) are ignored (§2.2.4).

Scale design: robots payloads are a per-HOST side table — tiny next to
the corpus — so `filter_disallowed` compiles one matcher per host ONCE in
an actor's __init__ from a broadcast (ray.put) dict and streams the
corpus through a pure map filter; no shuffle, no per-batch recompile.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

import pyarrow as pa


def _rule_regex(pattern: str) -> re.Pattern:
    """RFC 9309 §2.2.3 pattern -> anchored-at-start regex."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    out = "".join(".*" if ch == "*" else re.escape(ch) for ch in pattern)
    return re.compile("^" + out + ("$" if anchored else ""))


class RobotsMatcher:
    """Parsed robots.txt for ONE host; `allowed(path, agent)` applies the
    RFC 9309 group-selection + longest-match decision."""

    def __init__(self, text: str) -> None:
        # groups: {agent_lower: [(is_allow, pattern, regex, octet_len)]}
        self.groups: dict[str, list] = {}
        current_agents: list[str] = []
        rules_started = False
        for raw in (text or "").splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            key, sep, val = line.partition(":")
            if not sep:
                continue
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if rules_started:
                    current_agents = []  # a new group begins
                    rules_started = False
                current_agents.append(val.lower())
                self.groups.setdefault(val.lower(), [])
            elif key in ("allow", "disallow"):
                rules_started = True
                if not current_agents:
                    continue  # rules before any user-agent line: ignored
                if not val:
                    continue  # empty pattern matches nothing (§2.2.3)
                entry = (
                    key == "allow",
                    val,
                    _rule_regex(val),
                    len(val.encode("utf-8")),
                )
                for a in current_agents:
                    self.groups[a].append(entry)
            # unknown directives (crawl-delay, sitemap, ...): ignored

    def _rules_for(self, agent: str):
        a = agent.lower()
        if a in self.groups:
            return self.groups[a]
        return self.groups.get("*")

    def allowed(self, path: str, agent: str = "*") -> bool:
        rules = self._rules_for(agent)
        if not rules:
            return True
        path = path or "/"
        best_len, best_allow = -1, True
        for is_allow, _, rx, octets in rules:
            if rx.match(path):
                # longest match wins; Allow wins an exact length tie
                if octets > best_len or (octets == best_len and is_allow):
                    best_len, best_allow = octets, is_allow
        return best_allow if best_len >= 0 else True


def _path_of(url: str) -> str:
    try:
        p = urlparse(url)
    except ValueError:
        return "/"
    path = p.path or "/"
    if p.query:
        path += "?" + p.query
    return path


def _host_of(url: str) -> str:
    try:
        netloc = urlparse(url).netloc.lower()
    except ValueError:
        return ""
    return netloc.rsplit(":", 1)[0] if ":" in netloc else netloc


class _RobotsStage:
    """Actor-pool stage: compile every host's matcher ONCE per actor."""

    def __init__(self, robots_ref, agent: str, keep_col: str | None):
        import ray

        robots_by_host = ray.get(robots_ref)
        self.matchers = {h: RobotsMatcher(t) for h, t in robots_by_host.items()}
        self.agent = agent
        self.keep_col = keep_col

    def __call__(self, t: pa.Table, url_col: str) -> pa.Table:
        mask = []
        for u in t.column(url_col).to_pylist():
            m = self.matchers.get(_host_of(u or ""))
            mask.append(True if m is None else m.allowed(_path_of(u), self.agent))
        if self.keep_col is not None:
            return t.append_column(self.keep_col, pa.array(mask, type=pa.bool_()))
        return t.filter(pa.array(mask))


def filter_disallowed(
    ds,
    robots_by_host: dict[str, str],
    url_col: str = "url",
    agent: str = "*",
    annotate_col: str | None = None,
    concurrency: int | None = None,
):
    """Drop (or, with `annotate_col`, flag) rows whose url a host's
    robots.txt disallows for `agent`.  Hosts absent from the side table
    are allowed (no robots -> no restriction, RFC 9309 §2.3.1.2-4).

    The robots dict is broadcast once via ray.put; matchers compile once
    per actor in __init__ (stateful actor-pool stage, not per batch)."""
    import ray

    ref = ray.put(dict(robots_by_host))
    return ds.map_batches(
        _RobotsStage,
        fn_constructor_args=(ref, agent, annotate_col),
        fn_kwargs={"url_col": url_col},
        batch_format="pyarrow",
        concurrency=concurrency or 4,
    )
