"""Input normalizers (M5) — driver-side config validation.

Semantics of the reference's parameter cleaning
(`/root/reference/src/claude_job_agent/main.py:500-505, 593-597,
1311`): strip + require query, default location, clamp result counts,
whitelist remote preference, floor experience years, clamp timelines.
These run once per pipeline invocation on the driver (scalars, not a
dataset op).
"""

from __future__ import annotations

REMOTE_WHITELIST = {"remote", "hybrid", "onsite"}


def normalize_search_params(
    query: str,
    location: str | None = "London",
    max_results: int = 15,
) -> dict:
    if not query or not query.strip():
        raise ValueError("query parameter is required")
    return {
        "query": query.strip(),
        "location": location.strip() if location and location.strip() else "London",
        "max_results": max(1, min(int(max_results), 50)),
    }


def normalize_profile_params(
    experience_years: int = 0,
    remote_preference: str = "hybrid",
    timeline_months: int = 12,
) -> dict:
    pref = (remote_preference or "").strip().lower()
    return {
        "experience_years": max(0, int(experience_years)),
        "remote_preference": pref if pref in REMOTE_WHITELIST else "hybrid",
        "timeline_months": max(6, min(int(timeline_months), 120)),
    }
