"""operators/gates.py — paywall/consent-gate classification rules."""

from __future__ import annotations

from pdf_to_epub_spark.operators.gates import gate_rates, gate_signals

TEASER = (
    "Markets rallied early on Tuesday as investors digested the report. "
    "Subscribe to continue reading. Already a subscriber? Sign in. "
    "Unlock unlimited digital access."
)
CONSENT = (
    "We value your privacy. We and our partners use cookies. "
    "Accept all cookies or manage your preferences. "
) + "Actual article body here with plenty of real words. " * 30
# a FULL-LENGTH article that merely discusses subscriptions must pass
ARTICLE_ABOUT_PAYWALLS = (
    "The economics of news subscriptions changed; one subscriber at a "
    "time, outlets asked readers to subscribe. " + "word " * 300
)
PLAIN = "Nothing gated about this page at all. " * 10


def _signals(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
    return {r.doc_id: r for r in gate_signals(df).collect()}


def test_classification_rules(spark):
    out = _signals(
        spark,
        [
            (1, "a", TEASER),
            (2, "a", CONSENT),
            (3, "b", ARTICLE_ABOUT_PAYWALLS),
            (4, "b", PLAIN),
            (5, "b", None),
        ],
    )
    assert out[1].is_paywalled and not out[1].is_consent_gated
    assert out[2].is_consent_gated and not out[2].is_paywalled
    # ≥2 marker hits but NOT teaser-short → kept (truncation coupling)
    assert out[3].paywall_hits >= 2 and not out[3].is_paywalled
    assert not out[4].is_paywalled and not out[4].is_consent_gated
    assert out[4].paywall_hits == 0 and out[4].consent_hits == 0
    assert out[5].n_words == 0 and not out[5].is_paywalled


def test_extra_columns_pass_through_and_text_dropped(spark):
    out = gate_signals(
        spark.createDataFrame(
            [(1, "a", "x", TEASER)],
            "doc_id long, domain string, extra string, text string",
        )
    )
    assert "extra" in out.columns and "text" not in out.columns


def test_rates_rollup(spark):
    df = spark.createDataFrame(
        [
            (1, "a", TEASER),
            (2, "a", PLAIN),
            (3, "a", PLAIN),
            (4, "a", PLAIN),
            (5, "b", CONSENT),
            (6, "b", CONSENT),
        ],
        "doc_id long, domain string, text string",
    )
    rates = {r.domain: r for r in gate_rates(gate_signals(df)).collect()}
    assert rates["a"].n_pages == 4 and rates["a"].n_paywalled == 1
    assert rates["a"].paywall_rate == 0.25
    assert rates["b"].n_consent_gated == 2 and rates["b"].consent_rate == 1.0


def test_no_python_udf_in_plan(spark):
    df = spark.createDataFrame(
        [(1, "a", TEASER)], "doc_id long, domain string, text string"
    )
    plan = gate_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
