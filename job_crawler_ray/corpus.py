"""Deterministic synthetic crawl corpus (the ``pages`` table).

Builds the authoritative input table of `/root/repo/BASELINE.json`
``input_hint`` — ``(url:string, warc_ts:timestamp[us], html:binary,
text:large_string, lang:string)`` — from the driver's read-only
``documents.parquet`` (`/root/testdata/sf*/documents.parquet`), fully
distributed (one ``map_batches`` stage; no driver-side loop) and fully
deterministic: every field is a pure function of ``(doc_id, rep)`` via
a splitmix64 mixer, so the corpus is identical across runs, batch
sizes, and parallelism levels (required for the crawl-ordering /
seen-set parity tests).

Corpus properties (per SURVEY.md §7 / FIXTURES.md §1):

- **Zipf-skewed hosts**: 24 hosts, weight ∝ 1/rank^1.1, with
  ``bigboard.example.com`` dominating — exercises per-host politeness
  budgets and hot-host skew splitting.
- **Duplicate-after-canonicalization URLs**: ~4 % of rows emit a
  surface variant (``www.`` + trailing ``/`` + ``utm_*`` param) of a
  deterministic *leader* row's URL — exercises the URL-seen set.
- **Keyword-bearing text**: posting bodies are composed from the
  reference extractor's vocabulary tables (tech / experience / remote /
  benefits, `reference main.py:252-357`) so feature extraction is
  non-trivial; ``html`` embeds the body such that
  ``parse_pages_batch(html) == text`` byte-identically.
- ``replicate`` scales the corpus (pages = docs × replicate) for
  benching without new inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from job_crawler_ray.functions.extract import TECH_KEYWORDS
from job_crawler_ray.functions.html import META_FIELDS, render_pages

_u64 = np.uint64

HOSTS = ["bigboard.example.com", "megajobs.example.net"] + [
    f"jobs{i:02d}.example.org" for i in range(22)
]
_HOST_W = 1.0 / (np.arange(1, len(HOSTS) + 1) ** 1.1)
_HOST_CDF = np.cumsum(_HOST_W / _HOST_W.sum())

_SENIORITY = ["Junior", "Graduate", "Mid-level", "Senior", "Lead", "Principal", "Staff"]
_ROLES = [
    "Python Developer", "Data Engineer", "Platform Engineer", "Backend Developer",
    "Frontend Developer", "DevOps Engineer", "Machine Learning Engineer",
    "Site Reliability Engineer", "Product Manager", "Data Scientist",
]
_COMPANIES = [
    "TechCorp Ltd", "StartupXYZ", "DataWorks", "CloudNine Systems", "Acme Analytics",
    "Initech", "Globex", "Hooli", "VandelayTech", "Stark Industries",
    "Wayne Software", "Umbrella Data", "Pied Piper", "Aviato", "Dunder Mifflin Digital",
]
_LOCATIONS = ["London", "Manchester", "Edinburgh", "Bristol", "Leeds", "Cambridge", "Oxford"]
_EXperience_SENT = [
    "This is an entry level role for a recent graduate.",
    "You are an experienced engineer with 3-5 years in the field.",
    "We need a senior engineer with 7+ years of expert knowledge.",
    "You will be a manager and lead team of engineers reporting to the director.",
    "",
]
_REMOTE_SENT = [
    "Fully remote position, work from home anywhere.",
    "Hybrid working, 2-3 days in our city hub.",
    "Based in our London office, in person collaboration.",
    "",
]
_BENEFIT_SENT = [
    "We offer pension, private healthcare and 30 days holiday.",
    "Benefits include learning budget, gym membership and annual bonus.",
    "",
]
_CONTRACTS = ["full_time", "part_time", "contract", ""]
_CATEGORIES = ["IT Jobs", "Engineering Jobs", "Data Science Jobs", "Scientific Jobs"]

_TS_BASE_US = np.int64(pd.Timestamp("2024-01-01").value // 1000)  # µs epoch


def mix64(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer — deterministic per-row pseudo-randomness."""
    with np.errstate(over="ignore"):
        z = x.astype(_u64) + _u64(salt) * _u64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _u64(30))) * _u64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _u64(27))) * _u64(0x94D049BB133111EB)
        return z ^ (z >> _u64(31))


def _pick(arr: list[str], h: np.ndarray) -> np.ndarray:
    return np.asarray(arr, dtype=object)[(h % _u64(len(arr))).astype(np.int64)]


def _uniform(h: np.ndarray) -> np.ndarray:
    return h.astype(np.float64) / float(2**64)


def _host_of_key(key: np.ndarray) -> np.ndarray:
    idx = np.searchsorted(_HOST_CDF, _uniform(mix64(key, 1)), side="right")
    return np.asarray(HOSTS, dtype=object)[np.minimum(idx, len(HOSTS) - 1)]


def _url_base(doc_id: np.ndarray, rep: np.ndarray) -> pd.Series:
    """Pure function (doc_id, rep) → base URL; computable for any id."""
    key = (doc_id.astype(_u64) << _u64(20)) | rep.astype(_u64)
    host = _host_of_key(key)
    slug = mix64(key, 2) % _u64(100000)
    return pd.Series(
        np.char.add(
            np.char.add("https://", host.astype(str)),
            np.char.add(
                "/jobs/",
                np.char.add(
                    doc_id.astype(str),
                    np.char.add("-", np.char.add(rep.astype(str), np.char.add("-", slug.astype(str)))),
                ),
            ),
        ),
        dtype="object",
    )


class PageSynth:
    """Actor-pool page synthesizer: documents batch → pages batch (×replicate)."""

    def __init__(self, replicate: int = 1, ballast_chars: int = 400):
        self.replicate = int(replicate)
        self.ballast = int(ballast_chars)

    def __call__(self, batch: pa.Table) -> pa.Table:
        r = self.replicate
        doc_id = np.repeat(batch["doc_id"].to_numpy(), r)
        rep = np.tile(np.arange(r, dtype=np.int64), batch.num_rows)
        lang = pd.Series(np.repeat(batch["lang"].to_pandas().to_numpy(), r), dtype="object")
        ballast = pd.Series(
            np.repeat(batch["text"].to_pandas().fillna("").str.slice(0, self.ballast).to_numpy(), r),
            dtype="object",
        )
        key = (doc_id.astype(_u64) << _u64(20)) | rep.astype(_u64)

        seniority = _pick(_SENIORITY, mix64(key, 10))
        role = _pick(_ROLES, mix64(key, 11))
        title = pd.Series(np.char.add(np.char.add(seniority.astype(str), " "), role.astype(str)), dtype="object")
        company = pd.Series(_pick(_COMPANIES, mix64(key, 12)), dtype="object")
        location = pd.Series(_pick(_LOCATIONS, mix64(key, 13)), dtype="object")

        t1 = _pick(TECH_KEYWORDS, mix64(key, 14))
        t2 = _pick(TECH_KEYWORDS, mix64(key, 15))
        t3 = _pick(TECH_KEYWORDS, mix64(key, 16))
        tech_sent = pd.Series(
            np.char.add(
                "Our stack: ",
                np.char.add(
                    t1.astype(str),
                    np.char.add(", ", np.char.add(t2.astype(str), np.char.add(" and ", np.char.add(t3.astype(str), ".")))),
                ),
            ),
            dtype="object",
        )
        exp_sent = pd.Series(_pick(_EXperience_SENT, mix64(key, 17)), dtype="object")
        rem_sent = pd.Series(_pick(_REMOTE_SENT, mix64(key, 18)), dtype="object")
        ben_sent = pd.Series(_pick(_BENEFIT_SENT, mix64(key, 19)), dtype="object")

        text = (
            company + " is hiring a " + title + " in " + location + ". "
            + tech_sent + " " + exp_sent + " " + rem_sent + " " + ben_sent + " " + ballast
        )

        has_salary = _uniform(mix64(key, 20)) < 0.7
        smin = (30000 + (mix64(key, 21) % _u64(60)).astype(np.int64) * 1000).astype("float64")
        smax = smin + 10000 + (mix64(key, 22) % _u64(30)).astype(np.int64) * 1000
        smin_s = pd.Series(np.where(has_salary, smin.astype(np.int64).astype(str), ""), dtype="object")
        smax_s = pd.Series(np.where(has_salary, smax.astype(np.int64).astype(str), ""), dtype="object")

        ts_off = (mix64(key, 23) % _u64(365 * 86400)).astype(np.int64) * 1_000_000
        warc_ts = _TS_BASE_US + ts_off
        posted = pd.Series(
            pd.to_datetime(warc_ts, unit="us").strftime("%Y-%m-%dT%H:%M:%SZ"), dtype="object"
        )

        fields = pd.DataFrame(
            {
                "title": title,
                "company": company,
                "location": location,
                "salary_min": smin_s,
                "salary_max": smax_s,
                "contract_type": pd.Series(_pick(_CONTRACTS, mix64(key, 24)), dtype="object"),
                "posted_date": posted,
                "category": pd.Series(_pick(_CATEGORIES, mix64(key, 25)), dtype="object"),
            }
        )
        assert list(fields.columns) == META_FIELDS

        url = _url_base(doc_id, rep)
        # ~4% duplicate-after-canonicalization: surface variant of the
        # deterministic leader row (doc_id rounded down to a multiple of 10,
        # rep 0). Pure function of this row alone ⇒ partition-invariant.
        is_dup = (mix64(key, 26) % _u64(25) == 0) & ((doc_id % 10 != 0) | (rep != 0))
        if is_dup.any():
            leader_id = doc_id - (doc_id % 10)
            leader_url = _url_base(leader_id, np.zeros_like(rep))
            noisy = leader_url.str.replace("https://", "https://www.", regex=False) + "/?utm_source=feed&utm_ref=dup"
            url = url.where(~is_dup, noisy)

        html = render_pages(fields, text).str.encode("utf-8")
        return pa.table(
            {
                "url": pa.array(url, type=pa.string()),
                "warc_ts": pa.array(warc_ts, type=pa.timestamp("us")),
                "html": pa.array(html, type=pa.binary()),
                "text": pa.array(text, type=pa.large_string()),
                "lang": pa.array(lang, type=pa.string()),
            }
        )


def pages_dataset(
    sf_dir: str,
    replicate: int = 1,
    num_blocks: int | None = None,
    ballast_chars: int = 400,
):
    """documents.parquet → deterministic pages Dataset (input_hint schema).

    The driver tables are single-row-group files (one block ⇒ one
    task); ``repartition`` fans the seed rows out so synthesis — and
    everything downstream — parallelizes across the cluster.
    """
    import ray.data as rd

    if num_blocks is None:
        import ray

        num_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    from job_crawler_ray.util import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    ds = ds.repartition(num_blocks)
    return ds.map_batches(
        PageSynth(replicate=replicate, ballast_chars=ballast_chars),
        batch_format="pyarrow",
        batch_size=512,
    )


def pages_table(sf_dir: str, replicate: int = 1) -> pa.Table:
    """Driver-side (small-scale) synthesis without Ray — tests & oracles."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    return PageSynth(replicate=replicate)(docs)
