"""Produce the extraction-parity golden tables by running the reference
Step1→2→3 CLIs on every document of the driver testdata corpora.

Usage:  python tests/make_extraction_goldens.py

Writes two committed parquet tables under ``tests/golden/``:

``extraction_golden.parquet`` — one row per (corpus, document):
    corpus_key : md5 hex of doc_id 0's text — identifies WHICH corpus a
                 DuckDB oracle is looking at (sf0.001 and sf0.01 share
                 doc_ids but not texts, so row counts can't discriminate)
    url        : doc://<doc_id> (the engine's page-url mapping)
    text_sha   : sha256 hex of the reference Step3 output (UTF-8 bytes)
    n_chars    : len() of the reference Step3 output

``extraction_counters_golden.parquet`` — one row per (corpus, counter):
    corpus_key / counter / total — the whole-corpus sum of the reference
    ``--log`` JSON pass counters (step1.* / step2.*, flattened exactly like
    extractlib.pipeline._flatten_counters: ints and bools only, CLI meta
    keys and example lists skipped).

The goldens are REFERENCE-derived, so an oracle match against them is
exactly the north_rule's "byte-identical extracted text per url" contract
(and its per-pass lineage-counter analog).  The script also cross-checks
the engine's own ``transform_text`` against every golden text hash and
aborts on any parity gap — goldens are only committed when engine ==
reference.

Rerun only if the driver testdata changes.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import pathlib
import subprocess
import sys
import tempfile
from collections import Counter

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REF = pathlib.Path("/root/reference/text-processing")
GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"
OUT_TEXT = GOLDEN / "extraction_golden.parquet"
OUT_COUNTERS = GOLDEN / "extraction_counters_golden.parquet"
SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")

# Keys the reference writes about the CLI invocation itself, not the passes
# (same exclusion as tests/test_counter_parity.py).
_CLI_KEYS = {"status", "infile", "outfile", "length_in", "length_out"}


def _flatten(prefix: str, log: dict, out: dict[str, int]) -> None:
    for key, value in log.items():
        name = f"{prefix}.{key}"
        if isinstance(value, bool):
            out[name] = int(value)
        elif isinstance(value, int):
            out[name] = value
        elif isinstance(value, dict):
            _flatten(name, value, out)
        # strings / lists (examples) intentionally skipped


def _reference_doc(args: tuple[int, str]) -> tuple[int, str, int, dict[str, int]]:
    doc_id, text = args
    with tempfile.TemporaryDirectory(prefix=f"gold_{doc_id}_") as td:
        d = pathlib.Path(td)
        (d / "in.txt").write_text(text, encoding="utf-8")
        for script, src, dst, log in (
            ("Step1_ocr_cleanup_v11.py", "in.txt", "s1.txt", "s1.log"),
            ("Step2_formatting_v14.py", "s1.txt", "s2.txt", "s2.log"),
            ("Step3_structuring_v1.py", "s2.txt", "s3.txt", None),
        ):
            cmd = [sys.executable, str(REF / script), str(d / src), str(d / dst)]
            if log:
                cmd += ["--log", str(d / log)]
            subprocess.run(cmd, check=True, capture_output=True)
        out = (d / "s3.txt").read_text(encoding="utf-8")
        counters: dict[str, int] = {}
        for stage, log in (("step1", "s1.log"), ("step2", "s2.log")):
            raw = json.loads((d / log).read_text(encoding="utf-8"))
            raw = {k: v for k, v in raw.items() if k not in _CLI_KEYS}
            _flatten(stage, raw, counters)
    return doc_id, hashlib.sha256(out.encode("utf-8")).hexdigest(), len(out), counters


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_to_epub_spark.extractlib import transform_text

    text_rows: list[tuple[str, str, str, int]] = []
    counter_rows: list[tuple[str, str, int]] = []
    for sf_dir in SF_DIRS:
        tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        docs = sorted(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
        corpus_key = hashlib.md5(dict(docs)[0].encode("utf-8")).hexdigest()
        with mp.Pool(24) as pool:
            results = pool.map(_reference_doc, docs)
        totals: Counter[str] = Counter()
        mismatches = 0
        for (doc_id, sha, n_chars, counters), (_, text) in zip(sorted(results), docs):
            mine = transform_text(text)[0]
            if hashlib.sha256(mine.encode("utf-8")).hexdigest() != sha:
                mismatches += 1
                print(f"PARITY GAP at {sf_dir} doc {doc_id}", file=sys.stderr)
            text_rows.append((corpus_key, f"doc://{doc_id}", sha, n_chars))
            totals.update(counters)
        counter_rows.extend((corpus_key, k, v) for k, v in sorted(totals.items()))
        print(f"{sf_dir}: {len(results)} docs, corpus_key={corpus_key}, "
              f"counters={len(totals)}, mismatches={mismatches}")
        if mismatches:
            sys.exit(f"{mismatches} parity gaps — goldens NOT written")

    GOLDEN.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "corpus_key": [r[0] for r in text_rows],
                "url": [r[1] for r in text_rows],
                "text_sha": [r[2] for r in text_rows],
                "n_chars": [r[3] for r in text_rows],
            }
        ),
        OUT_TEXT,
    )
    pq.write_table(
        pa.table(
            {
                "corpus_key": [r[0] for r in counter_rows],
                "counter": [r[1] for r in counter_rows],
                "total": [r[2] for r in counter_rows],
            }
        ),
        OUT_COUNTERS,
    )
    print(f"wrote {OUT_TEXT} ({len(text_rows)} rows), "
          f"{OUT_COUNTERS} ({len(counter_rows)} rows)")


if __name__ == "__main__":
    main()
