"""Golden + oracle-parity tests for the flagship extractor (M1/M2).

Golden expectations mirror the reference's own unit assertions
(`/root/reference/tests/test_main.py:279-317, 723-741`) without
importing any reference code.
"""

import pandas as pd
import pyarrow as pa
import pytest

from job_crawler_ray.corpus import pages_table
from job_crawler_ray.functions.extract import (
    analysis_framework_batch,
    extract_benefit_classes_batch,
    extract_features_batch,
    extract_features_row,
)
from job_crawler_ray.functions.html import parse_pages_batch

GOLDEN_JOB = {
    "title": "Senior Python Developer",
    "company": "TechCorp Ltd",
    "description": (
        "We are looking for a Senior Python Developer with expertise in "
        "Django, PostgreSQL, and AWS. Must have 5+ years experience. "
        "Remote work available. Docker and Kubernetes experience preferred. "
        "Benefits include pension and flexible working."
    ),
    "salary_min": 70000,
    "salary_max": 90000,
}


def _one_row_table(job: dict) -> pa.Table:
    return pa.table({k: [v] for k, v in job.items()})


class TestGoldenExtraction:
    def test_golden_job_features(self):
        out = extract_features_batch(_one_row_table(GOLDEN_JOB)).to_pylist()[0]
        for kw in ("python", "django", "aws", "docker"):
            assert kw in out["tech_stack"]
        assert out["experience_level"] == "senior"
        assert out["remote_policy"] == "remote"
        assert out["has_benefits"] is True
        assert out["salary_avg"] == 80000.0

    def test_salary_absent(self):
        job = dict(GOLDEN_JOB, salary_min=None, salary_max=None)
        out = extract_features_batch(_one_row_table(job)).to_pylist()[0]
        assert out["salary_avg"] is None

    def test_salary_zero_is_missing(self):
        # Python truthiness in the reference (main.py:325-331) rejects 0
        job = dict(GOLDEN_JOB, salary_min=0, salary_max=90000)
        out = extract_features_batch(_one_row_table(job)).to_pylist()[0]
        assert out["salary_avg"] is None

    def test_first_match_wins_order(self):
        # "junior" precedes "senior" in the ordered scan even if both hit
        job = dict(GOLDEN_JOB, description="junior role; senior mentorship available")
        out = extract_features_batch(_one_row_table(job)).to_pylist()[0]
        assert out["experience_level"] == "junior"

    def test_remote_scans_description_only(self):
        job = dict(GOLDEN_JOB, title="Remote Engineer", description="plain role in town")
        out = extract_features_batch(_one_row_table(job)).to_pylist()[0]
        assert out["remote_policy"] == "not_specified"

    def test_malformed_rows_do_not_crash(self):
        t = pa.table(
            {
                "title": [None, "", "X", None],
                "company": ["A", None, "", None],
                "description": [None, "", None, ""],
                "salary_min": [None, 1, None, None],
                "salary_max": [None, None, 2, None],
            }
        )
        out = extract_features_batch(t)
        assert out.num_rows == 4
        assert out.to_pylist()[0]["tech_stack"] == []

    def test_framework_truncation_invariant(self):
        job = dict(GOLDEN_JOB, description="x" * 1800)
        out = analysis_framework_batch(_one_row_table(job)).to_pylist()[0]
        assert len(out["job_description_800"]) == 800
        assert GOLDEN_JOB["title"] in out["requirements_prompt"]

    def test_benefit_classes(self):
        job = dict(GOLDEN_JOB, description="We offer pension, gym and training courses")
        out = extract_benefit_classes_batch(_one_row_table(job)).to_pylist()[0]
        assert set(out["benefit_classes"]) == {"Financial", "Development", "Perks"}


class TestCorpusParity:
    """Vectorized kernel == scalar reference-semantics oracle, row by row."""

    @pytest.fixture(scope="class")
    def parsed(self, sf_small):
        return parse_pages_batch(pages_table(sf_small, replicate=2))

    def test_byte_identical_text(self, parsed):
        assert (
            parsed["extracted_text"].to_pandas() == parsed["text"].to_pandas()
        ).all()

    def test_every_row_matches_scalar_oracle(self, parsed):
        df = extract_features_batch(parsed).to_pandas()
        rows = parsed.to_pylist()
        for i, row in enumerate(rows):
            ref = extract_features_row(row)
            got = df.iloc[i]
            assert list(got["tech_stack"]) == ref["tech_stack"]
            assert got["experience_level"] == ref["experience_level"]
            assert got["remote_policy"] == ref["remote_policy"]
            assert bool(got["has_benefits"]) == ref["has_benefits"]
            assert int(got["description_length"]) == ref["description_length"]
            if ref["salary_info"]:
                assert got["salary_avg"] == ref["salary_info"]["average"]
            else:
                assert pd.isna(got["salary_avg"])


class TestStopwordFastKernel:
    """The one-pass byte kernel must equal the regex tier exactly
    (it replaced 40 per-word regex scans in the enrich hot path)."""

    def test_matches_regex_on_documents(self, sf_mid):
        import numpy as np
        import pyarrow.parquet as pq

        from job_crawler_ray.pipelines import textops as T

        col = pq.read_table(f"{sf_mid}/documents.parquet")["text"]
        words = T.STOPWORDS + [w for lg in T.LANG_STOPWORDS.values() for w in lg]
        mat = T._stopword_count_matrix(col, words)
        assert mat is not None
        lower = col.to_pandas().fillna("").str.lower()
        ref = np.column_stack(
            [lower.str.count(r"\b" + w + r"\b").to_numpy() for w in words]
        )
        assert (mat == ref).all()

    def test_edge_cases_and_unicode_fallback(self):
        import numpy as np
        import pyarrow as pa

        from job_crawler_ray.pipelines import textops as T

        edge = pa.array(
            ["", None, "the", "the the the", "xthe they the9 the_ the-y the.the",
             "a a_a a9 a _a a", "    the   ", "THE The tHe",
             "punct,the,punct the!the?the", "_the_ the_ _the the"]
        )
        words = T.STOPWORDS + ["und", "der"]
        mat = T._stopword_count_matrix(edge, words)
        lower = edge.to_pandas().fillna("").str.lower()
        ref = np.column_stack(
            [lower.str.count(r"\b" + w + r"\b").to_numpy() for w in words]
        )
        assert (mat == ref).all()
        # duplicate words across lists count independently
        m = T._stopword_count_matrix(pa.array(["the a the"]), ["the", "a", "the"])
        assert (m == np.array([[2, 1, 2]])).all()
        # non-ASCII text → None (callers take the regex tier)
        assert T._stopword_count_matrix(pa.array(["thé the"]), T.STOPWORDS) is None
