"""Shared driver-contract helpers (mechanical __spark_entry__ split).

Header of the original single-file module: spark-side package
shipping, testdata table loader, and the shared constants — plus
leaf oracle helpers that both query builders and oracle fragments
call (kept here to keep the chunk import graph acyclic).
"""
from __future__ import annotations

import pathlib
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``pdf_to_epub_spark`` importable on executors regardless of the
    driver's cwd: zip the package once per SparkContext and addPyFile it
    (the same mechanism as ``spark-submit --py-files``)."""
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    import tempfile
    import zipfile

    pkg = pathlib.Path(__file__).resolve().parent.parent / "pdf_to_epub_spark"
    tmp = tempfile.NamedTemporaryFile(
        prefix="pdf_to_epub_spark_", suffix=".zip", delete=False
    )
    with zipfile.ZipFile(tmp.name, "w") as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, f"pdf_to_epub_spark/{p.relative_to(pkg)}")
    sc.addPyFile(tmp.name)
    _SHIPPED.add(id(sc))

# sources/pdf.py layout constants, inlined into the pdf_extract_blocks
# oracle (import kept lazy there; these two are the whole contract)
_PDF_WPL = 8   # words per rendered line  (= sources.pdf.WORDS_PER_LINE)
_PDF_LPP = 6   # line blocks per page     (= sources.pdf.LINES_PER_PAGE)

_LANG_MARKER_SQL = {
    "en": "('the','and','of','to','a','in','is','was')",
    "fr": "('le','la','les','et','de','un','une','est')",
    "de": "('der','die','das','und','ist','ein','nicht')",
    "es": "('el','la','los','y','de','que','es')",
    "it": "('il','la','di','e','che','un','per')",
    "la": "('et','in','est','non','cum','ad','quod')",
}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_as_pages(docs: DataFrame) -> DataFrame:
    """Adapt the testdata documents table (doc_id, text, lang, …) to the
    engine's page-input shape (url, warc_ts, lang, text)."""
    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
        F.col("lang"),
        F.col("text"),
    )


def _vec_lit(v: list[float]) -> str:
    return "[" + ",".join(repr(float(x)) for x in v) + "]::DOUBLE[]"
