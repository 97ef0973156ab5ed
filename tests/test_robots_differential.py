"""Differential fuzz of the relational RFC 9309 parser: a ~40-line
imperative reference implementation (independent of the Spark window /
join machinery) is run over hundreds of seeded-random policies and URL
sets, and every verdict + crawl-delay must match operators/robots.py.

This pins the exact bug class the round-4 advisor found (group-boundary
and group-visibility subtleties the planted closed-form oracles were
too regular to catch): all policies travel in ONE robots table and the
comparison runs in two Spark actions, so the fuzz stays fast."""

import random
import re

import pytest

from go_readability_spark.operators import (
    crawl_delays,
    robots_rules,
    robots_verdicts,
)

GROUP_FIELDS = {"allow", "disallow", "crawl-delay"}
_FIELD_RE = re.compile(r"^([A-Za-z-]+)\s*:(.*)$")
_META_RE = re.compile(r"([.^$+?(){}\[\]\\|])")


def _ref_parse(txt):
    """Imperative reference: list of groups, each
    {agents, rules [(allow, path)], delays}.  Segmentation over ALL
    group-scoped fields; empty-value allow/disallow keep the group
    visible (no-op); rules before any User-agent line are ignored;
    unknown fields are invisible (do not end a UA run)."""
    groups, cur, prev_was_ua = [], None, False
    for raw in txt[:512_000].split("\n"):
        line = raw.split("#", 1)[0].strip()
        m = _FIELD_RE.match(line) if line else None
        if not m:
            continue
        field, value = m.group(1).lower(), m.group(2).strip()
        if field == "user-agent":
            if not prev_was_ua:
                cur = {"agents": set(), "rules": [], "delays": []}
                groups.append(cur)
            cur["agents"].add(value.lower())
            prev_was_ua = True
        elif field in GROUP_FIELDS:
            prev_was_ua = False
            if cur is None:
                continue
            if field == "crawl-delay":
                try:
                    cur["delays"].append(float(value))
                except ValueError:
                    pass
            elif value != "":
                cur["rules"].append((field == "allow", value))
    return groups


def _ref_regex(pat):
    anchor = pat.endswith("$")
    body = pat[:-1] if anchor else pat
    esc = _META_RE.sub(r"\\\1", body).replace("*", ".*")
    return "^" + esc + ("$" if anchor else "")


def _applicable(groups, agent):
    specific = [g for g in groups if agent in g["agents"]]
    return specific if specific else [g for g in groups if "*" in g["agents"]]


def _ref_verdict(groups, url, agent):
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", url)
    path = m.group(1) if m and m.group(1) else "/"
    best = None
    for g in _applicable(groups, agent):
        for allow, pat in g["rules"]:
            if re.search(_ref_regex(pat), path):
                key = (len(pat), 1 if allow else 0, pat)
                if best is None or key > best:
                    best = key
    if best is None:
        return True, None
    return best[1] == 1, best[2]


def _ref_delay(groups, agent):
    specific = [d for g in groups if agent in g["agents"] for d in g["delays"]]
    if specific:
        return max(specific)
    star = [d for g in groups if "*" in g["agents"] for d in g["delays"]]
    return max(star) if star else None


def _random_policy(rng):
    agents = ["*", "graftbot", "otherbot", "crawler9"]
    segs = ["docs", "t", "a.b", "x(1)", "img", "private", "p+q"]
    def path():
        parts = [rng.choice(segs) for _ in range(rng.randint(1, 3))]
        p = "/" + "/".join(parts)
        if rng.random() < 0.3:
            p = p.replace(parts[0], "*", 1) if rng.random() < 0.5 else p + "*"
        if rng.random() < 0.25:
            p += ".html$" if rng.random() < 0.5 else "$"
        if rng.random() < 0.2:
            p += "/"
        return p
    lines = []
    for _ in range(rng.randint(1, 5)):  # groups-ish blocks
        if rng.random() < 0.15:
            lines.append(f"Disallow: {path()}")  # rule before any UA line
        for _ in range(rng.randint(1, 2)):
            lines.append(f"User-agent: {rng.choice(agents)}")
        for _ in range(rng.randint(0, 4)):
            r = rng.random()
            if r < 0.35:
                lines.append(f"Disallow: {path()}")
            elif r < 0.55:
                lines.append(f"Allow: {path()}")
            elif r < 0.65:
                lines.append("Disallow:")  # allow-all idiom
            elif r < 0.75:
                lines.append(f"Crawl-delay: {rng.choice(['2', '10.5', 'oops'])}")
            elif r < 0.85:
                lines.append(f"Sitemap: https://x.example.org/{rng.randint(0,9)}.xml")
            else:
                lines.append(f"Unknown-field: {rng.randint(0, 99)}")
        if rng.random() < 0.6:
            lines.append("")
        if rng.random() < 0.3:
            lines.append("# comment")
    return "\n".join(lines) + "\n"


def _random_urls(rng, host, n=6):
    segs = ["docs", "t", "a.b", "x(1)", "img", "private", "p+q", "zz"]
    urls = []
    for _ in range(n):
        p = "/" + "/".join(rng.choice(segs) for _ in range(rng.randint(1, 3)))
        if rng.random() < 0.3:
            p += ".html"
        if rng.random() < 0.2:
            p += "?q=1"
        if rng.random() < 0.1:
            p = ""
        urls.append(f"https://{host}{p}")
    return urls


@pytest.mark.parametrize("agent", ["*", "graftbot", "crawler9"])
def test_differential_verdicts_random_policies(spark, agent):
    rng = random.Random(20250817 + len(agent))
    n_hosts = 120
    policies = {f"h{j}.example.org": _random_policy(rng) for j in range(n_hosts)}
    url_rows = [(u,) for h in policies for u in _random_urls(rng, h)]
    robots = spark.createDataFrame(
        list(policies.items()), "host string, robots_txt string")
    pages = spark.createDataFrame(url_rows, "url string")
    got = {r.url: (r.allowed, r.rule)
           for r in robots_verdicts(pages, robots_rules(robots),
                                    agent=agent).collect()}
    parsed = {h: _ref_parse(t) for h, t in policies.items()}
    assert len(got) == len(set(u for (u,) in url_rows))
    for (u,) in url_rows:
        host = u.split("/")[2]
        exp = _ref_verdict(parsed[host], u, agent)
        assert got[u] == exp, (u, policies[host], got[u], exp)


@pytest.mark.parametrize("agent", ["*", "graftbot"])
def test_differential_crawl_delays(spark, agent):
    rng = random.Random(99 + len(agent))
    policies = {f"d{j}.example.org": _random_policy(rng) for j in range(120)}
    robots = spark.createDataFrame(
        list(policies.items()), "host string, robots_txt string")
    got = {r.host: r.delay_sec
           for r in crawl_delays(robots, agent=agent).collect()}
    for h, txt in policies.items():
        exp = _ref_delay(_ref_parse(txt), agent)
        assert got.get(h) == exp, (h, txt, got.get(h), exp)
