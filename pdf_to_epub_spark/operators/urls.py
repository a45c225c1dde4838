"""URL canonicalization — the key-normalization step in front of any
url-keyed operation (dedup, resume index, re-crawl diffing): two captures
of the same page under trivially different URLs must collide.

Pure JVM column algebra (regexp + array functions — RE2-compatible
patterns so the DuckDB oracle replays every rule bit-for-bit):

1. strip the fragment (``#…`` never reaches the server);
2. lowercase scheme + authority (host names are case-insensitive; paths
   are NOT touched — they are case-sensitive per RFC 3986);
3. drop default ports (``http://…:80``, ``https://…:443``);
4. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``mc_eid``);
5. sort the surviving query parameters (param order is
   semantics-preserving for the overwhelming majority of endpoints and is
   the standard CC-pipeline normalization);
6. normalize an empty path to ``/``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_PATTERN = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid)="


def canonical_url(url_col: Column) -> Column:
    no_frag = F.regexp_replace(url_col, r"#.*$", "")
    head = F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
    rest = F.substring(no_frag, F.length(head) + 1, F.lit(2_147_483_647))
    head = F.lower(head)
    head = F.regexp_replace(head, r"^(http://[^:/]*):80$", r"$1")
    head = F.regexp_replace(head, r"^(https://[^:/]*):443$", r"$1")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    params = F.sort_array(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
        )
    )
    qs = F.concat_ws("&", params)
    return F.concat(
        head,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canon_url"
) -> DataFrame:
    return df.withColumn(out_col, canonical_url(F.col(url_col)))
