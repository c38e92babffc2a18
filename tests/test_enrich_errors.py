"""Row-level error contract of the enrich stage (reference
`main.py:545-548`): a poison row degrades — raw columns kept, enriched
columns null, error recorded — instead of failing the batch/crawl."""

import numpy as np
import pandas as pd
import pyarrow as pa

from job_crawler_ray.functions.enrich import enrich_pages_batch


def _page_batch(texts):
    n = len(texts)
    t = pd.Series(texts)
    return pa.table(
        {
            "url": pa.array([f"https://x.example/{i}" for i in range(n)]),
            "title": pa.array(["Engineer"] * n),
            "company": pa.array(["Acme"] * n),
            "location": pa.array(["London"] * n),
            "contract_type": pa.array(["full_time"] * n),
            "posted_date": pa.array(["2024-01-01"] * n),
            "category": pa.array(["it-jobs"] * n),
            "salary_min": pa.array(np.full(n, 50000.0)),
            "salary_max": pa.array(np.full(n, 70000.0)),
            "extracted_text": pa.array(t, type=pa.large_string()),
            "description": pa.array(t.str.slice(0, 1000), type=pa.string()),
        }
    )


def test_happy_path_has_null_error_column():
    out = enrich_pages_batch(_page_batch(["python developer", "senior data role"]))
    assert "enrich_error" in out.column_names
    assert out["enrich_error"].null_count == out.num_rows


def test_poison_row_degrades_not_raises(monkeypatch):
    from job_crawler_ray.pipelines import textops

    orig = textops.token_count_batch

    def poisoned(batch, text_col="text"):
        if any("POISON" in (t or "") for t in batch[text_col].to_pylist()):
            raise ValueError("injected extractor failure")
        return orig(batch, text_col)

    monkeypatch.setattr(textops, "token_count_batch", poisoned)
    out = enrich_pages_batch(
        _page_batch(["fine document one", "POISON document", "fine document two"])
    )
    df = out.to_pandas()
    # every row kept, original order
    assert len(df) == 3
    assert list(df["extracted_text"].str.contains("POISON")) == [False, True, False]
    # poison row: error recorded, enriched column null, raw column intact
    assert df.loc[1, "enrich_error"].startswith("ValueError")
    assert pd.isna(df.loc[1, "n_tokens"])
    assert df.loc[1, "title"] == "Engineer"
    # healthy rows fully enriched, no error
    assert df.loc[0, "enrich_error"] is None or pd.isna(df.loc[0, "enrich_error"])
    assert df.loc[0, "n_tokens"] == 3
    assert df.loc[2, "n_tokens"] == 3
