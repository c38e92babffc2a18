"""Job-posting feature extraction — the flagship per-document operator.

Semantics-parity port of the reference extractor
``extract_basic_job_features`` (`/root/reference/src/claude_job_agent/
main.py:246-358`) and ``create_analysis_framework`` (`main.py:361-437`),
re-expressed as vectorized Arrow/numpy batch kernels for
``Dataset.map_batches(batch_format="pyarrow")``:

- tech-stack extraction: membership scan of the 38-keyword vocabulary
  (`main.py:252-290`) over ``lower(description) + lower(title)``,
  emitted as ``list<string>`` in vocabulary order (reference emits in
  list order via comprehension, `main.py:307-310`).
- experience level: FIRST-MATCH-WINS ordered scan junior → mid →
  senior → management (`main.py:293-298`, break at `main.py:316` makes
  dict insertion order semantic); scans description OR title.
- remote policy: first-match remote → hybrid → onsite
  (`main.py:301-305`); scans DESCRIPTION ONLY (`main.py:319-321`).
- salary struct {min,max,average=(min+max)/2} only when both bounds
  are present, non-null and non-zero (`main.py:325-339` — Python
  truthiness also rejects 0).
- description_length = codepoint length (`main.py:346`).
- has_benefits = any of 6 benefit keywords in description
  (`main.py:347-357`).
- analysis framework: 3 prompt templates interpolating title/company/
  description[:800] + constant scoring criteria (`main.py:368-429`),
  truncation invariant len<=800 (`main.py:433`).

The keyword TABLES are copied verbatim (they are the semantics under
test — golden values in reference `tests/test_main.py:279-299` depend
on them); the execution strategy (bool matrix → Arrow ListArray, numpy
``select`` for the ordered classifiers) is new.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# --- vocabulary tables (reference main.py:252-290, 293-305, 351-357) ---

TECH_KEYWORDS = [
    "python", "javascript", "java", "c++", "c#", "ruby", "php", "go", "rust",
    "react", "vue", "angular", "node", "django", "flask", "spring", "laravel",
    "aws", "azure", "gcp", "docker", "kubernetes", "terraform", "jenkins",
    "sql", "postgresql", "mysql", "mongodb", "redis", "elasticsearch",
    "git", "agile", "scrum", "devops", "ci/cd", "microservices", "api",
]

EXPERIENCE_INDICATORS = {  # ordered; first match wins
    "junior": ["junior", "graduate", "entry level", "1-2 years", "early career"],
    "mid": ["mid", "intermediate", "3-5 years", "4+ years", "experienced"],
    "senior": ["senior", "lead", "5+ years", "7+ years", "expert", "principal"],
    "management": ["manager", "director", "head of", "vp", "cto", "lead team"],
}

REMOTE_INDICATORS = {  # ordered; first match wins; description only
    "remote": ["remote", "work from home", "wfh", "distributed"],
    "hybrid": ["hybrid", "flexible", "2-3 days", "part remote"],
    "onsite": ["office", "on-site", "in person", "london office"],
}

BENEFIT_KEYWORDS = ["pension", "healthcare", "insurance", "holiday", "flexible", "learning"]

# benefit→keywords classes of the reference's identify-benefits map
# (main.py:1026-1041), used by extract_benefit_classes (M7)
BENEFIT_CLASSES = {
    "health": ["healthcare", "medical", "dental", "vision", "health insurance"],
    "time_off": ["holiday", "vacation", "pto", "annual leave", "time off"],
    "financial": ["pension", "401k", "bonus", "equity", "shares", "stock"],
    "flexibility": ["flexible", "remote", "work from home", "flexible hours"],
    "development": ["training", "learning", "development", "conference", "courses"],
    "perks": ["gym", "free food", "snacks", "social events", "team events"],
}


def _as_string_array(haystack) -> pa.ChunkedArray | pa.Array:
    if isinstance(haystack, (pa.Array, pa.ChunkedArray)):
        return pa.compute.fill_null(haystack, "")
    return pa.compute.fill_null(
        pa.array(haystack, type=pa.string(), from_pandas=True), ""
    )


def _contains_matrix(haystack, needles: list[str]) -> np.ndarray:
    """(n_rows, n_needles) bool matrix of substring containment.

    One ``pyarrow.compute.match_substring`` C++ scan per needle —
    plain-byte containment, identical to the previous pandas
    ``.str.contains(regex=False)`` semantics but without its
    per-row-per-needle Python lambda (which dominated the crawl's
    enrich CPU). Accepts a pandas Series or an Arrow string array.
    """
    import pyarrow.compute as pc

    hay = _as_string_array(haystack)
    cols = [
        pc.match_substring(hay, k).to_numpy(zero_copy_only=False)
        for k in needles
    ]
    return np.column_stack(cols) if cols else np.zeros((len(hay), 0), bool)


def _first_match(classes: dict[str, list[str]], *haystacks) -> np.ndarray:
    """Ordered first-match-wins classification → object array of labels."""
    import pyarrow.compute as pc

    hays = [_as_string_array(h) for h in haystacks]
    conds = []
    for keywords in classes.values():
        hit = np.zeros(len(hays[0]), dtype=bool)
        for kw in keywords:
            for hs in hays:
                hit |= pc.match_substring(hs, kw).to_numpy(
                    zero_copy_only=False
                )
        conds.append(hit)
    return np.select(conds, list(classes.keys()), default="not_specified")


def _list_array_from_matrix(matrix: np.ndarray, vocab: list[str]) -> pa.ListArray:
    """Rows of a bool matrix → list<string> of vocab terms hit, in vocab order."""
    counts = matrix.sum(axis=1)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    row_idx, col_idx = np.nonzero(matrix)  # row-major ⇒ vocab order within row
    vocab_np = np.asarray(vocab, dtype=object)
    values = pa.array(vocab_np[col_idx], type=pa.string())
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)


def extract_features_batch(
    batch: pa.Table,
    description_col: str = "description",
    title_col: str = "title",
    salary_min_col: str | None = "salary_min",
    salary_max_col: str | None = "salary_max",
    flatten: bool = True,
) -> pa.Table:
    """Vectorized M1: append extracted-feature columns to an Arrow batch.

    With ``flatten=True`` emits scalar columns (tech_stack:list<string>,
    experience_level, remote_policy, salary_avg, description_length,
    has_benefits, salary struct fields) — the shape the DuckDB oracle
    can reproduce. With ``flatten=False`` additionally nests the salary
    struct like the reference's ``salary_info``.
    """
    import pyarrow.compute as pc

    n = batch.num_rows
    # Arrow-native haystacks: fill/lower/join/measure are all C++
    # kernels on the (ASCII-or-UTF-8) string buffers — the previous
    # pandas object-dtype path paid a Python call per row per needle
    desc_raw = pc.fill_null(batch[description_col], "")
    title_raw = (
        pc.fill_null(batch[title_col], "")
        if title_col and title_col in batch.column_names
        else pa.array([""] * n, type=pa.string())
    )
    desc = pc.utf8_lower(desc_raw)
    title = pc.utf8_lower(title_raw)

    # single scan for "in description or title"; NUL separator cannot occur
    # inside any keyword, so no cross-junction false positives
    both = pc.binary_join_element_wise(desc, title, "\x00")
    tech_matrix = _contains_matrix(both, TECH_KEYWORDS)
    tech_stack = _list_array_from_matrix(tech_matrix, TECH_KEYWORDS)

    experience = _first_match(EXPERIENCE_INDICATORS, desc, title)
    remote = _first_match(REMOTE_INDICATORS, desc)

    has_benefits = _contains_matrix(desc, BENEFIT_KEYWORDS).any(axis=1)

    desc_len = pc.utf8_length(desc_raw).to_numpy(zero_copy_only=False).astype(np.int64)

    out = batch.append_column("tech_stack", tech_stack)
    out = out.append_column("experience_level", pa.array(experience, type=pa.string()))
    out = out.append_column("remote_policy", pa.array(remote, type=pa.string()))
    out = out.append_column("has_benefits", pa.array(has_benefits))
    out = out.append_column("description_length", pa.array(desc_len, type=pa.int64()))

    if salary_min_col and salary_min_col in batch.column_names:
        smin = batch[salary_min_col].to_pandas()
        smax = batch[salary_max_col].to_pandas()
        valid = smin.notna() & smax.notna() & (smin != 0) & (smax != 0)
        avg = ((smin + smax) / 2.0).where(valid)
        out = out.append_column(
            "salary_avg", pa.array(avg.astype("float64"), from_pandas=True)
        )
        if not flatten:
            struct = pa.StructArray.from_arrays(
                [
                    pa.array(smin.where(valid).astype("float64"), from_pandas=True),
                    pa.array(smax.where(valid).astype("float64"), from_pandas=True),
                    pa.array(avg.astype("float64"), from_pandas=True),
                ],
                names=["min", "max", "average"],
            )
            out = out.append_column("salary_info", struct)
    return out


def extract_features_row(job: dict) -> dict:
    """Scalar twin of the reference extractor — test oracle only.

    Independent re-implementation of `main.py:246-358` semantics used
    to golden-check the vectorized kernel row by row.
    """
    description = (job.get("description") or "").lower()
    title = (job.get("title") or "").lower()
    found = [k for k in TECH_KEYWORDS if k in description or k in title]
    exp = "not_specified"
    for level, kws in EXPERIENCE_INDICATORS.items():
        if any(k in description or k in title for k in kws):
            exp = level
            break
    rem = "not_specified"
    for policy, kws in REMOTE_INDICATORS.items():
        if any(k in description for k in kws):
            rem = policy
            break
    smin, smax = job.get("salary_min"), job.get("salary_max")
    salary = {}
    if smin and smax and isinstance(smin, (int, float)) and isinstance(smax, (int, float)):
        salary = {"min": smin, "max": smax, "average": (smin + smax) / 2}
    return {
        "tech_stack": found,
        "experience_level": exp,
        "remote_policy": rem,
        "salary_info": salary,
        "description_length": len(job.get("description", "") or ""),
        "has_benefits": any(b in description for b in BENEFIT_KEYWORDS),
    }


# --- M2: analysis framework (main.py:361-437) -------------------------------

SCORING_CRITERIA = {
    "technical_skills": [
        "Exact match for required skills",
        "Related/transferable skills",
        "Learning curve for missing skills",
    ],
    "experience": [
        "Years of experience alignment",
        "Relevant project experience",
        "Industry experience match",
    ],
    "cultural_fit": [
        "Company size preference",
        "Industry alignment",
        "Remote work policy match",
    ],
    "growth_potential": [
        "Career progression opportunities",
        "Skill development prospects",
        "Learning and training offered",
    ],
}


def analysis_framework_batch(
    batch: pa.Table,
    description_col: str = "description",
    title_col: str = "title",
    company_col: str = "company",
) -> pa.Table:
    """Vectorized M2: append framework columns (truncated desc ≤ 800).

    Emits ``job_description_800`` (the truncation invariant of
    `main.py:433`, asserted by reference `tests/test_main.py:723-741`)
    and the requirements-extraction prompt interpolated per row.
    """
    title = batch[title_col].to_pandas().fillna("")
    company = (
        batch[company_col].to_pandas().fillna("")
        if company_col in batch.column_names
        else pd.Series([""] * batch.num_rows)
    )
    desc800 = batch[description_col].to_pandas().fillna("").str.slice(0, 800)
    prompt = (
        "Analyze this job posting and extract required skills, experience,"
        " responsibilities, benefits and red flags.\nJob Title: "
        + title
        + "\nCompany: "
        + company
        + "\nDescription: "
        + desc800
    )
    out = batch.append_column("job_description_800", pa.array(desc800, type=pa.string()))
    out = out.append_column("requirements_prompt", pa.array(prompt, type=pa.string()))
    return out


def extract_benefit_classes_batch(batch: pa.Table, description_col: str = "description") -> pa.Table:
    """M7 (main.py:1026-1041): benefit classes hit, Title-Cased, list<string>."""
    desc = batch[description_col].to_pandas().fillna("").str.lower()
    labels = [name.replace("_", " ").title() for name in BENEFIT_CLASSES]
    conds = []
    for kws in BENEFIT_CLASSES.values():
        hit = np.zeros(len(desc), dtype=bool)
        for kw in kws:
            hit |= desc.str.contains(kw, regex=False).to_numpy()
        conds.append(hit)
    matrix = np.column_stack(conds)
    return batch.append_column("benefit_classes", _list_array_from_matrix(matrix, labels))
