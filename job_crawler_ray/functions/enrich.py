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


def enrich_pages_batch(batch: pa.Table, text_col: str = "extracted_text") -> pa.Table:
    from job_crawler_ray.pipelines.textops import (
        lang_id_batch,
        quality_score_batch,
        simhash_batch,
        token_count_batch,
    )

    out = extract_features_batch(batch)
    out = analysis_framework_batch(out)
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
