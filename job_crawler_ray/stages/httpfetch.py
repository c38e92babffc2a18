"""HTTP-shaped fetch variant: persistent-client actor pool + local server.

The reference fetches pages over HTTP with a persistent client and a
15 s timeout, degrading errors to empty results instead of raising
(`/root/reference/src/claude_job_agent/main.py:213-243`). This module
provides the same SHAPE against a local in-process HTTP server (no
external network exists in this sandbox):

- :class:`CorpusHTTPServer` — a threading HTTP server over the bucket-
  partitioned corpus store (``GET /page?url=<quoted>`` → html bytes,
  404 unknown). Test/demo transport for the fetcher.
- :class:`HttpFetcher` — a callable CLASS for
  ``map_batches(HttpFetcher, concurrency=N, ...)``: the persistent
  ``http.client`` connection is built once per actor in ``__init__``
  (the reference's persistent-client semantics), rows are fetched over
  keep-alive in ``__call__``. Transport errors / timeouts degrade to
  a missing page (→ 404 row), never an exception (`main.py:241-243`).

On top of the transported bytes the fetcher applies the SAME
deterministic row semantics as the direct-fragment path
(``_fetch_semantics``: status / pseudo-latency / byte counts), so a
crawl run is BIT-IDENTICAL under either fetcher — which is exactly
what the parity test asserts.

The direct-fragment path (stages/fetch.py) remains the bench/default
transport; this variant exists for reference-shape parity and as the
template a real deployment would use.
"""

from __future__ import annotations

import http.client
import threading
import urllib.parse

import numpy as np
import pandas as pd
import pyarrow as pa

from job_crawler_ray.stages.fetch import _fetch_semantics

FETCH_TIMEOUT_S = 15.0  # reference main.py:214


class CorpusHTTPServer:
    """In-process threading HTTP server over a corpus store directory.

    Serves ``GET /page?url=<quoted-url>`` with the page's html bytes
    (200) or 404. Pages are loaded once at startup (test corpora are
    small; a production server would page per bucket).
    """

    def __init__(self, store_dir: str, host: str = "127.0.0.1", port: int = 0):
        import http.server

        import pyarrow.dataset as pads

        store = pads.dataset(store_dir, partitioning="hive")
        tbl = store.to_table(columns=["url", "html"])
        pages = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API name)
                parsed = urllib.parse.urlparse(self.path)
                if parsed.path != "/page":
                    self.send_error(404)
                    return
                q = urllib.parse.parse_qs(parsed.query)
                url = q.get("url", [None])[0]
                html = pages.get(url) if url else None
                if html is None:
                    self.send_error(404)
                    return
                body = html if isinstance(html, bytes) else str(html).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # silence per-request stderr
                pass

        self.httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self.base_url = f"http://{host}:{self.httpd.server_address[1]}"
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()


class HttpFetcher:
    """Actor-pool fetch stage with a persistent HTTP connection.

    ``__init__`` (once per actor): parse the base url, open the
    keep-alive connection. ``__call__`` (per batch): GET each row's
    url; timeout / transport error / non-200 → page treated as absent
    (row degrades to 404 downstream), the connection is re-opened and
    the crawl continues — never an exception (reference
    `main.py:241-243`).
    """

    def __init__(self, base_url: str, timeout_s: float = FETCH_TIMEOUT_S):
        parsed = urllib.parse.urlparse(base_url)
        self.host = parsed.hostname
        self.port = parsed.port
        self.timeout_s = timeout_s
        self._conn = None
        self._connect()

    def _connect(self):
        import http.client

        if self._conn is not None:
            try:
                self._conn.close()
            except OSError:
                pass
        self._conn = http.client.HTTPConnection(
            self.host, self.port, timeout=self.timeout_s
        )

    def _get(self, url: str) -> bytes | None:
        quoted = urllib.parse.quote(url, safe="")
        for attempt in (0, 1):  # one reconnect retry on a dropped keep-alive
            try:
                self._conn.request("GET", f"/page?url={quoted}")
                resp = self._conn.getresponse()
                body = resp.read()
                if resp.status == 200:
                    return body
                return None
            except (OSError, TimeoutError, http.client.HTTPException):
                self._connect()
                if attempt == 1:
                    return None
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            out = batch.append_column("html", pa.array([], pa.binary()))
            out = out.append_column("status_code", pa.array([], pa.int32()))
            out = out.append_column("fetch_latency_ms", pa.array([], pa.float64()))
            return out.append_column("response_bytes", pa.array([], pa.int64()))
        urls = batch["url"].to_pandas()
        keys = batch["url_key"].to_numpy()
        html_map: dict[str, bytes] = {}
        for u in pd.unique(urls):
            body = self._get(u)
            if body is not None:
                html_map[u] = body
        html, status, latency_ms, nbytes = _fetch_semantics(urls, keys, html_map)
        out = batch.append_column(
            "html", pa.array(html, type=pa.binary(), from_pandas=True)
        )
        out = out.append_column("status_code", pa.array(status))
        out = out.append_column("fetch_latency_ms", pa.array(latency_ms))
        return out.append_column("response_bytes", pa.array(nbytes.to_numpy()))
