"""Per-host politeness: robots rules + token-bucket budget release.

Crawl-scale design for what the reference only implies (page cap 50 at
`/root/reference/src/claude_job_agent/main.py:207`, request timeouts at
`main.py:214`, rate-limit guidance in its README): an explicit per-host
token bucket whose refill interval is the crawl epoch — each host may
release at most ``budget`` URLs per epoch — plus a robots allow/deny
table applied before any budget is spent.

Both are implemented as Dataset-native operations so they stay
deterministic and shuffle-efficient:

- robots: a small host→disallow-prefix table broadcast with
  ``ray.put`` and applied as a vectorized filter inside ``map_batches``
  (no shuffle).
- budget release: ``groupby("host")`` (the ONE partitioning key reused
  by frontier, politeness and skew handling) → ``map_groups`` that
  sorts the host's rows by the frontier priority order
  (warc_ts DESC, canonical_url ASC — the reference crawls
  newest-first, `main.py:210` ``sort_by: "date"``) and releases the
  first ``budget``. Hot hosts (the Zipf head) are bounded by the
  budget itself, which is exactly the skew cap: no host can dominate
  an epoch's fetch wave.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from job_crawler_ray.hashing import xxh64

PRIORITY_SORT = ["warc_ts", "canonical_url"]  # warc_ts DESC, canonical ASC
_ASCENDING = [False, True]


def synth_robots(hosts: list[str]) -> dict[str, str]:
    """Deterministic synthetic robots rules: ~1 host in 6 disallows a
    path prefix. Stand-in for fetched robots.txt (no network in this
    sandbox); the cache shape (host → disallow prefix) is the real one.
    """
    rules: dict[str, str] = {}
    for h in hosts:
        v = xxh64(h.encode())
        if v % 6 == 0:
            rules[h] = f"/jobs/{v % 10}"
        # else: allow all
    return rules


def parse_robots_txt(
    content: str, user_agent: str = "jobcrawler"
) -> list[tuple[bool, str]]:
    """REAL robots.txt parser (RFC 9309 / REP semantics) → the ordered
    ``[(allow, path_pattern), ...]`` rule list for the most specific
    matching user-agent group.

    - groups: consecutive ``User-agent`` lines head a group; the group
      whose agent token is the LONGEST case-insensitive substring of
      our product token wins, ``*`` is the fallback; multiple groups
      for the same agent merge (RFC 9309 §2.2.1).
    - rules: ``Allow``/``Disallow`` with ``*`` wildcards and ``$`` end
      anchor; an EMPTY ``Disallow:`` means allow-all (no rule).
    - evaluation (see :func:`_robots_allowed_mask`): longest-pattern
      match decides, ``Allow`` winning length ties — the documented
      Googlebot tiebreak. No matching rule ⇒ allowed.

    The reference implies robots compliance in its crawl guidance
    (README.md:354-358); no network in this sandbox, so content
    arrives as a fixture/column and ``synth_robots`` remains the
    deterministic stand-in generator.
    """
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_group_body = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:
                groups.append((agents, rules))
                agents, rules = [], []
                in_group_body = False
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_group_body = True
            if not agents:
                continue  # rules before any user-agent line: ignored
            if value:
                rules.append((field == "allow", value))
            # empty Disallow/Allow = no rule (allow-all group marker)
    if agents:
        groups.append((agents, rules))
    # most specific agent token wins; '*' is the fallback
    best_len, best_rules, star_rules = -1, None, None
    for agents_g, rules_g in groups:
        for tok in agents_g:
            if tok == "*":
                star_rules = (
                    rules_g if star_rules is None else star_rules + rules_g
                )
            elif tok in ua and len(tok) > best_len:
                best_len, best_rules = len(tok), rules_g
            elif tok in ua and len(tok) == best_len and best_rules is not None:
                best_rules = best_rules + rules_g
    if best_rules is not None:
        return best_rules
    return star_rules or []


def _robots_pattern_match(path: pd.Series, pattern: str) -> np.ndarray:
    """Vectorized REP pattern match: plain prefixes use startswith;
    patterns with ``*``/``$`` translate to an anchored regex."""
    if "*" not in pattern and not pattern.endswith("$"):
        return path.str.startswith(pattern).to_numpy()
    import re

    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    if anchored:
        rx += "$"
    return path.str.match(rx).fillna(False).to_numpy()


def _robots_allowed_mask(
    path: pd.Series, rules: list[tuple[bool, str]]
) -> np.ndarray:
    """REP decision per row: the longest matching pattern decides,
    Allow winning length ties; no match ⇒ allowed."""
    best_len = np.zeros(len(path), dtype=np.int64)
    allowed = np.ones(len(path), dtype=bool)
    for allow, pattern in rules:
        m = _robots_pattern_match(path, pattern)
        plen = len(pattern)
        upd = m & ((plen > best_len) | ((plen == best_len) & allow))
        allowed[upd] = allow
        best_len = np.where(m & (plen > best_len), plen, best_len)
    return allowed


def robots_filter_batch(
    batch: pa.Table, rules: dict[str, str | list[tuple[bool, str]]]
) -> pa.Table:
    """Drop rows whose (host, path) hits a disallow decision.
    Vectorized; per-host rule values are either a single disallow
    prefix string (the ``synth_robots`` stand-in shape) or a parsed
    ``[(allow, pattern), ...]`` list from :func:`parse_robots_txt` —
    both live in the same broadcast host→rules cache."""
    if not rules or batch.num_rows == 0:
        return batch
    host = batch["host"].to_pandas()
    canon = batch["canonical_url"].to_pandas()
    # path of the canonical url = substring after "scheme://host"
    after_scheme = canon.str.partition("://")[2]
    path = after_scheme.str.partition("/")[1] + after_scheme.str.partition("/")[2]
    disallowed = np.zeros(len(host), dtype=bool)
    simple = {h: r for h, r in rules.items() if isinstance(r, str)}
    parsed = {h: r for h, r in rules.items() if not isinstance(r, str)}
    if simple:
        prefix = host.map(simple)
        # few distinct disallow prefixes → one vectorized startswith each
        for pre in prefix.dropna().unique():
            sel = (prefix == pre).to_numpy()
            disallowed[sel] = path[sel].str.startswith(pre).to_numpy()
    for h, rl in parsed.items():
        sel = (host == h).to_numpy()
        if sel.any() and rl:
            disallowed[sel] = ~_robots_allowed_mask(path[sel], rl)
    return batch.filter(pa.array(~disallowed))


def make_budget_release(budget: int):
    """map_groups fn: release ≤ ``budget`` rows per host per epoch.

    Emits the group with two extra columns: ``released`` (bool) and
    ``host_rank`` (0-based rank in the host's priority order, only
    meaningful for released rows). Deterministic: pure sort + head —
    the token bucket whose refill interval is the epoch.
    """
    budget = int(budget)

    def budget_release(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(PRIORITY_SORT, ascending=_ASCENDING, kind="mergesort")
        rank = np.arange(len(g), dtype=np.int64)
        return g.assign(host_rank=rank, released=rank < budget)

    return budget_release


def _sort_keys(priority_col: str | None) -> tuple[list[str], list[bool]]:
    """Release order keys: optional frontier PRIORITY first (DESC —
    higher priority crawls first; the SURVEY total order
    (priority, host, warc_ts, url) with priority opt-in), then the
    newest-first reference order."""
    if priority_col:
        return [priority_col] + PRIORITY_SORT, [False] + _ASCENDING
    return PRIORITY_SORT, _ASCENDING


def make_bounded_budget_release(
    budget: int, host_budgets: dict[str, int] | None = None,
    priority_col: str | None = None,
):
    """Bounded-memory budget release: ``(partial_fn, release_fn)``.

    :func:`make_budget_release` alone materializes each host's ENTIRE
    pending frontier in one pandas group — unbounded for the Zipf-head
    host. This two-level variant bounds every group while keeping ONE
    shuffle execution and an identical released set:

    - ``partial_fn`` (map_batches, per block): rank the block's rows
      per host in priority order. Rows with block-rank < budget are
      CANDIDATES (grouped under key = host — any globally released row
      is provably a candidate, and every row preceding a released row
      is too, so candidate-set rank == global rank for released rows).
      Rows at block-rank ≥ budget can never be released (≥ budget
      higher-priority rows exist in their own block); they get key =
      host + chr(0) + (block_rank // budget) so the groupby spreads
      them over budget-row slices instead of one unbounded group.
    - ``release_fn`` (map_groups over ``rel_grp``): candidate groups
      (≤ budget × blocks rows) sort + rank exactly like
      :func:`make_budget_release`; overflow groups just get
      ``released=False`` (their ``host_rank`` is -1 — the contract
      says it is only meaningful for released rows, and the crawl
      drops it from the remaining frontier).

    Deterministic under the same assumption as the one-level release:
    no exact (warc_ts, canonical_url) ties within a host.

    ``host_budgets`` (the 429/backoff feedback loop): optional per-host
    overrides of ``budget`` — only throttled hosts appear, so the map
    ships as a few entries in the task closure. Bounds are unchanged:
    a host's candidate group is ≤ its own budget × blocks rows.
    """
    budget = int(budget)
    host_budgets = {h: int(b) for h, b in (host_budgets or {}).items()}
    keys, asc = _sort_keys(priority_col)

    def _budget_of(hosts: pd.Series) -> np.ndarray:
        if not host_budgets:
            return np.full(len(hosts), budget, dtype=np.int64)
        return (
            hosts.map(host_budgets).fillna(budget).astype(np.int64).to_numpy()
        )

    def partial_release(t: pa.Table) -> pa.Table:
        # Arrow in, STRIPPED Arrow out: this stage feeds the rel_grp
        # shuffle, and pandas-converted blocks entering a shuffle carry
        # unhashable pandas schema metadata (Ray logs "Failed to hash
        # the schemas" on every reduce task)
        from job_crawler_ray.util import strip_meta

        df = t.to_pandas()
        g = df.sort_values(
            ["host"] + keys, ascending=[True] + asc, kind="mergesort",
        )
        brank = g.groupby("host", sort=False).cumcount().to_numpy()
        bud = _budget_of(g["host"])
        over = brank >= bud
        key = g["host"].copy()
        if over.any():
            key[over] = (
                g["host"][over] + "\x00" + pd.Series(
                    brank[over] // bud[over], index=g.index[over]
                ).astype(str)
            )
        out = g.assign(rel_grp=key, _cand=~over)
        return strip_meta(pa.Table.from_pandas(out, preserve_index=False))

    def release_fn(group: pd.DataFrame) -> pd.DataFrame:
        if bool(group["_cand"].iat[0]):
            g = group.sort_values(keys, ascending=asc, kind="mergesort")
            rank = np.arange(len(g), dtype=np.int64)
            bud = host_budgets.get(g["host"].iat[0], budget)
            out = g.assign(host_rank=rank, released=rank < bud)
        else:
            out = group.assign(
                host_rank=np.full(len(group), -1, dtype=np.int64),
                released=False,
            )
        return out.drop(columns=["rel_grp", "_cand"])

    return partial_release, release_fn
