"""URL canonicalization + host extraction, vectorized for Arrow batches.

The reference deduplicates on a normalized string key built with
``lower()`` + concatenation (``/root/reference/src/claude_job_agent/
main.py:521``) and enforces global URL uniqueness via ``url TEXT
UNIQUE`` (``main.py:141``). At crawl scale the analog is a canonical
URL form hashed with xxh64 (north rule). Canonicalization rules
(standard crawler practice, cf. RFC 3986 §6):

- lowercase scheme + host
- strip trailing ``/`` runs on the path
- drop the fragment (``#...``)
- drop a default port (``:80`` http / ``:443`` https)
- strip a leading ``www.`` host label
- drop common tracking query params (``utm_*``) and sort the rest

Implemented with pandas vectorized string ops (no per-row Python in
the hot path beyond the rare query-string rewrite).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from job_crawler_ray.hashing import as_signed, xxh64_array

_SCHEME_SEP = "://"


def _split_frame(urls: pd.Series) -> pd.DataFrame:
    s = urls.fillna("")
    # scheme
    has_scheme = s.str.contains(_SCHEME_SEP, regex=False)
    scheme = s.str.partition(_SCHEME_SEP)[0].where(has_scheme, "http").str.lower()
    rest = s.str.partition(_SCHEME_SEP)[2].where(has_scheme, s)
    # fragment off first
    rest = rest.str.partition("#")[0]
    # query off next (handles host?q=1 with no path), then netloc / path
    q_parts = rest.str.partition("?")
    before_q, query = q_parts[0], q_parts[2]
    p_parts = before_q.str.partition("/")
    netloc = p_parts[0]
    path = (p_parts[1] + p_parts[2]).fillna("")
    return pd.DataFrame(
        {"scheme": scheme, "netloc": netloc, "path": path, "query": query}
    )


def _canon_query(q: str) -> str:
    if not q:
        return ""
    parts = [p for p in q.split("&") if p and not p.startswith("utm_")]
    parts.sort()
    return "&".join(parts)


def _canon_from_frame(f: pd.DataFrame) -> pd.Series:
    netloc = f["netloc"].str.lower()
    netloc = netloc.str.replace(r"^www\.", "", regex=True)
    is_https = f["scheme"].eq("https")
    netloc = netloc.str.replace(r":80$", "", regex=True).where(~is_https, netloc)
    netloc = netloc.str.replace(r":443$", "", regex=True).where(is_https, netloc)
    path = f["path"].str.replace(r"/+$", "", regex=True)
    path = path.where(path.str.len() > 0, "")
    # query rewrite: only rows that actually carry a query string
    query = f["query"].copy()
    mask = query.str.len() > 0
    if mask.any():
        query.loc[mask] = query.loc[mask].map(_canon_query)
    out = f["scheme"] + _SCHEME_SEP + netloc + path
    out = out.where(~(query.str.len() > 0), out + "?" + query)
    out.name = "canonical_url"
    return out


def _host_from_frame(f: pd.DataFrame) -> pd.Series:
    host = f["netloc"].str.lower()
    host = host.str.replace(r"^www\.", "", regex=True)
    host = host.str.partition(":")[0]
    host.name = "host"
    return host


def _as_series(urls) -> pd.Series:
    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = urls.to_pandas()
    if not isinstance(urls, pd.Series):
        urls = pd.Series(urls, dtype="object")
    return urls


def canonicalize_urls(urls) -> pd.Series:
    """Vectorized canonical form of a URL column (str Series / Arrow array)."""
    return _canon_from_frame(_split_frame(_as_series(urls)))


def hosts_of(urls) -> pd.Series:
    """Vectorized registrable-host extraction (lowercased, no port/www)."""
    return _host_from_frame(_split_frame(_as_series(urls)))


def url_keys(urls) -> np.ndarray:
    """uint64 xxh64 keys of the canonical URL forms."""
    return xxh64_array(pa.array(canonicalize_urls(urls), type=pa.string()))


def add_url_key_columns(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """map_batches projection: append canonical_url, host, url_key
    columns. One split pass feeds both canonical and host derivations;
    keys hash straight off the Arrow buffers of the canonical array
    (the numpy-object path would re-encode every row)."""
    urls = batch[url_col].to_pandas()
    f = _split_frame(urls)
    canon = _canon_from_frame(f)
    host = _host_from_frame(f)
    canon_arr = pa.array(canon, type=pa.string())
    keys = as_signed(xxh64_array(canon_arr))
    batch = batch.append_column("canonical_url", canon_arr)
    batch = batch.append_column("host", pa.array(host, type=pa.string()))
    batch = batch.append_column("url_key", pa.array(keys, type=pa.int64()))
    return batch
