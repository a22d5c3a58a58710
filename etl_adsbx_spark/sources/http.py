"""HTTP micro-batch source — the ADSBX fetch (task.ts:118-129, R2).

The reference pushes its geo predicate (lat/lon/dist) to the server in the
URL — predicate pushdown to the source (SURVEY.md §4) — and busts HTTP
caches with a timestamp param (task.ts:122). The Spark shape: a driver-side
fetch per scheduled tick feeding ``createDataFrame`` → one micro-batch.
Network access is not assumed in this environment: ``fetch_fn`` is
injectable, and tests feed fixture payloads.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .files import parse_envelope


def build_url(base: str, lat: float, lon: float, dist_nm: float) -> str:
    """Geo-radius query URL (task.ts:118-122): the lat/lon/dist predicate is
    evaluated server-side; `cacheBuster` defeats intermediary caching."""
    return (
        f"{base}/lat/{lat}/lon/{lon}/dist/{dist_nm}/"
        f"?cacheBuster={int(time.time() * 1000)}"
    )


def default_fetch(url: str, token: str | None = None) -> str:  # pragma: no cover
    """Driver-side GET with auth header (task.ts:124-129). Kept import-safe:
    urllib is stdlib; real deployments may swap in requests/aiohttp."""
    import urllib.request

    req = urllib.request.Request(url, headers={"api-auth": token or ""})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.read().decode("utf-8")


def fetch_batch(
    spark: SparkSession,
    url: str,
    token: str | None = None,
    fetch_fn: Callable[[str, str | None], str] | None = None,
) -> DataFrame:
    """One micro-batch: fetch → validate (FAILFAST) → explode to rows with
    ingestion order. Equivalent to one scheduled reference tick (R29)."""
    fetch = fetch_fn or default_fetch
    payload = fetch(url, token)
    # sanity: payload must be a JSON object (cheap driver-side pre-check)
    json.loads(payload)
    raw = spark.createDataFrame([(payload,)], "value string")
    return parse_envelope(raw, strict=True)
