"""Full per-document enrichment: everything the engine extracts per page.

The crawl's extract stage composes ALL per-document operators (the
reference runs its whole enhancement suite per record inside the search
loop, `/root/reference/src/claude_job_agent/main.py:530-548`):

- M1 job features (tech stack, experience, remote, salary, benefits)
- M2 analysis-framework truncation + prompt
- M7 benefit classes
- token count, quality signals, language guess (text analysis tier)
- 64-bit SimHash content fingerprint (near-dup key for downstream
  dedup of crawled text)

One ``map_batches`` stage, Arrow in / Arrow out, every kernel
vectorized; SimHash is the heaviest (sliding-window shingle hashing).
"""

from __future__ import annotations

import pyarrow as pa

from job_crawler_ray.functions.extract import (
    analysis_framework_batch,
    extract_benefit_classes_batch,
    extract_features_batch,
)
from job_crawler_ray.functions.frameworks import framework_prompts_append


def _enrich_inner(batch: pa.Table, text_col: str) -> pa.Table:
    from job_crawler_ray.pipelines.textops import (
        lang_id_batch,
        quality_score_batch,
        simhash_batch,
        token_count_batch,
    )

    out = extract_features_batch(batch)
    out = analysis_framework_batch(out)
    # full M2 surface per crawled page (reference main.py:530-548 runs
    # the whole suite per record): requirements prompt above + the 3
    # constant prompt/criteria columns
    out = framework_prompts_append(out)
    out = extract_benefit_classes_batch(out)
    # text-analysis kernels drop their input column; run them on a
    # projection and append the results
    stats = pa.table({"_i": pa.array(range(out.num_rows), pa.int64())})
    proj = out.select([text_col]).rename_columns(["text"])
    for fn in (token_count_batch, quality_score_batch, lang_id_batch, simhash_batch):
        res = fn(proj)
        for name in res.column_names:
            stats = stats.append_column(name, res[name])
    for name in stats.column_names:
        if name != "_i":
            out = out.append_column(name, stats[name])
    return out


def enrich_pages_batch(batch: pa.Table, text_col: str = "extracted_text") -> pa.Table:
    """Enrichment with the reference's row-level error contract
    (`main.py:545-548`): a row that breaks an extractor is KEPT with its
    raw columns, null enriched columns and the error message in
    ``enrich_error`` — the batch (and the crawl) never fails. The happy
    path stays fully vectorized; the per-row fallback runs only on a
    batch that actually raised."""
    n = batch.num_rows
    try:
        out = _enrich_inner(batch, text_col)
        return out.append_column(
            "enrich_error", pa.array([None] * n, type=pa.string())
        )
    except Exception:
        target = _enrich_inner(batch.slice(0, 0), text_col).schema
        rows: list[pa.Table] = []
        errors: list[str | None] = []
        for i in range(n):
            row = batch.slice(i, 1)
            try:
                rows.append(_enrich_inner(row, text_col))
                errors.append(None)
            except Exception as exc:  # degrade THIS row only
                arrays = []
                for f in target:
                    if f.name in row.column_names:
                        arrays.append(row[f.name].cast(f.type))
                    else:
                        arrays.append(pa.nulls(1, type=f.type))
                rows.append(pa.table(dict(zip(target.names, arrays))))
                errors.append(f"{type(exc).__name__}: {exc}")
        out = pa.concat_tables([r.cast(target) for r in rows])
        return out.append_column("enrich_error", pa.array(errors, type=pa.string()))
