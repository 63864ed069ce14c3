"""PII detection/redaction family (functions/pii.py + the four
pii_* / stream_pii_* queries).

The correctness gate (tools/check_oracle.py) already proves Spark ==
DuckDB bit-exact on the full outputs; these tests pin the things the
oracle can't see: the regex-disjointness contract the count parity
depends on, the closed-form planted expectations, scrub completeness,
and the map-only physical plan."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from synthetic_datagen_spark.functions import pii
from synthetic_datagen_spark.operators import REGISTRY


def _counts(spark, text: str) -> dict[str, int]:
    df = spark.createDataFrame([(text,)], ["t"])
    row = df.select(
        *[
            pii.pii_count("t", pat).alias(name)
            for name, pat, _ in pii.PII_TYPES
        ]
    ).first()
    return row.asDict()


def test_each_pattern_matches_its_own_class(spark):
    assert _counts(spark, "mail me at a.b+tag@mail-3.example.co.uk ok") == {
        "email": 1, "cc": 0, "ssn": 0, "phone": 0, "ip": 0,
    }
    # parenthesized phone: the deliberate ABSENCE of a leading \b is
    # what lets this match ('(' is a non-word char — a leading \b
    # would reject every parenthesized number)
    assert _counts(spark, "call (555) 123 4567 now") == {
        "email": 0, "cc": 0, "ssn": 0, "phone": 1, "ip": 0,
    }
    assert _counts(spark, "call 555-123-4567 or 555.123.4567") == {
        "email": 0, "cc": 0, "ssn": 0, "phone": 2, "ip": 0,
    }
    assert _counts(spark, "host 10.255.0.13 down") == {
        "email": 0, "cc": 0, "ssn": 0, "phone": 0, "ip": 1,
    }
    assert _counts(spark, "ssn 123-45-6789 on file") == {
        "email": 0, "cc": 0, "ssn": 1, "phone": 0, "ip": 0,
    }
    # r12 fifth class: cards in dashed, spaced, and contiguous formats
    assert _counts(spark, "card 4111-1111-1111-1111 on file") == {
        "email": 0, "cc": 1, "ssn": 0, "phone": 0, "ip": 0,
    }
    assert _counts(spark, "pay 5555 5555 5555 4444 or 378282246310005") == {
        "email": 0, "cc": 2, "ssn": 0, "phone": 0, "ip": 0,
    }


def test_pattern_disjointness(spark):
    """The mutual-disjointness contract (functions/pii.py docstring):
    each class's text must match ONLY its own pattern — cross-matches
    would break count parity between extraction and redaction."""
    # SSN's \d{2} middle group rejects the phone pattern and vice versa
    assert _counts(spark, "123-45-6789")["phone"] == 0
    assert _counts(spark, "555-123-4567")["ssn"] == 0
    # dotted phone has 3 groups / 4-digit tail — not a 4-octet IP
    assert _counts(spark, "555.123.4567")["ip"] == 0
    # IP octets (max 3 digits) never satisfy phone's \d{4} tail
    assert _counts(spark, "10.255.200.113")["phone"] == 0
    # digits+dots inside an email local part match nothing else
    c = _counts(spark, "u.12345.x+tag@mail-3.example.co.uk")
    assert c == {"email": 1, "cc": 0, "ssn": 0, "phone": 0, "ip": 0}
    # trailing \b: longer digit runs are NOT phones/SSNs/IPs
    assert _counts(spark, "order 555-123-45678 ref") == {
        "email": 0, "cc": 0, "ssn": 0, "phone": 0, "ip": 0,
    }
    assert _counts(spark, "v 10.2.3.4567 x")["ip"] == 0
    # cards never cross-match: 4-digit groups fail phone's 3-digit
    # middle, no SSN shape, no 4-octet dots; and a contiguous PAN
    # inside a longer digit run or an email local part has no boundary
    for card in ("4111-1111-1111-1111", "5555 5555 5555 4444",
                 "378282246310005"):
        c = _counts(spark, f"x {card} y")
        assert c == {"email": 0, "cc": 1, "ssn": 0, "phone": 0, "ip": 0}, card
    assert _counts(spark, "ref 94111111111111111119 x")["cc"] == 0  # 20 digits
    assert _counts(spark, "m 378282246310005x@example.com")["cc"] == 0


def test_redaction_is_complete_and_ordered(spark):
    txt = (
        "u 123-45-6789 then (555) 123 4567 then 10.0.0.1 "
        "then bob@example.com pays 4111-1111-1111-1111 done"
    )
    df = spark.createDataFrame([(txt,)], ["t"])
    red = df.select(pii.pii_redact("t").alias("r")).first()["r"]
    assert red == "u <SSN> then <PHONE> then <IP> then <EMAIL> pays <CC> done"
    # idempotent: placeholders contain no digits or '@'
    red2 = (
        spark.createDataFrame([(red,)], ["t"])
        .select(pii.pii_redact("t").alias("r"))
        .first()["r"]
    )
    assert red2 == red


def test_planted_counts_closed_form(spark, sf_smoke):
    """The doc_id-keyed injection makes expected per-type totals a
    closed form over the doc_id set."""
    panel = REGISTRY["pii_extract_panel"].build(spark, sf_smoke)
    got = panel.agg(
        F.sum("n_email").alias("e"),
        F.sum("n_phone").alias("p"),
        F.sum("n_ip").alias("i"),
        F.sum("n_ssn").alias("s"),
        F.sum("n_cc").alias("c"),
    ).first()
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    assert got["e"] == sum(1 for d in ids if d % 5 == 0)
    assert got["p"] == sum(1 for d in ids if d % 7 == 0)
    assert got["i"] == sum(1 for d in ids if d % 11 == 0)
    assert got["s"] == sum(1 for d in ids if d % 13 == 0)
    assert got["c"] == sum(1 for d in ids if d % 19 == 0)
    assert panel.count() == len(ids)  # filterless: one row per doc
    # doc 0 carries all five classes at once
    d0 = panel.filter(F.col("doc_id") == 0).first()
    assert (
        d0["n_email"], d0["n_phone"], d0["n_ip"], d0["n_ssn"], d0["n_cc"]
    ) == (1, 1, 1, 1, 1)
    assert d0["sample_email"] == "u.0.x+tag@mail-0.example.co.uk"


def test_scrub_output_invariants(spark, sf_smoke):
    out = REGISTRY["corpus_pii_scrub"].build(spark, sf_smoke)
    agg = out.agg(
        F.sum("n_residual").alias("resid"),
        F.sum(
            (
                (F.col("n_redactions") > 0)
                & (F.col("n_chars_after") == F.col("n_chars_before"))
            ).cast("long")
        ).alias("same_len_with_redactions"),
        F.count("*").alias("n"),
    ).first()
    assert agg["resid"] == 0  # scrub completeness over every doc
    # every redacted doc's length actually changed (placeholder widths
    # differ from the injected PII strings by construction)
    assert agg["same_len_with_redactions"] == 0
    assert agg["n"] == spark.read.parquet(
        f"{sf_smoke}/documents.parquet"
    ).count()


def test_funnel_stage_monotonicity(spark, sf_smoke):
    v2 = REGISTRY["corpus_curation_pii_v2"].build(spark, sf_smoke).collect()
    assert len(v2) > 0
    for r in v2:
        assert r["total"] >= r["quality_pass"] >= r["exact_kept"]
        assert r["pii_docs"] <= r["quality_pass"]
        assert r["total_redactions"] >= r["pii_docs"]


def _plan(spark, name: str, sf: str) -> str:
    df = REGISTRY[name].build(spark, sf)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_detect_and_scrub_plans_are_map_only(spark, sf_smoke):
    """The 100 TB contract: detection and redaction are pure per-row
    regex projections — no join, no aggregate, and no shuffle beyond
    _docs_wide's round-robin spread (which becomes a no-op when the
    source splits natively)."""
    for name in ("pii_extract_panel", "corpus_pii_scrub"):
        plan = _plan(spark, name, sf_smoke)
        assert "Exchange hashpartitioning" not in plan, (name, plan)
        assert "HashAggregate" not in plan, (name, plan)
        assert "Join" not in plan, (name, plan)
        # one source scan (formatted explain prints each node twice:
        # once in the tree, once in the numbered detail section)
        import re

        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, (
            name, plan,
        )


def test_stream_scrub_is_stateless(spark, sf_smoke):
    """The streaming twin keeps zero state: its plan must contain no
    stateful operator (no StateStore, no watermark, no agg)."""
    out = REGISTRY["stream_pii_scrub_parity"].build(spark, sf_smoke)
    # build() already ran the stream to completion; the parity content
    # itself is oracle-checked — here pin row-count == corpus size
    # (exactly-once across the 4 micro-batch splits, no dupes/drops)
    n_docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs


def test_luhn_kernel(spark):
    """functions/pii.luhn_valid: the public network test numbers are
    valid; any single-digit mutation flips the checksum; sub-12-digit
    strings are rejected regardless of checksum."""
    cases = [
        ("4111111111111111", True),
        ("5555555555554444", True),
        ("378282246310005", True),
        ("6011111111111117", True),
        ("4111111111111112", False),  # mutated check digit
        ("5555555555554434", False),  # mutated middle digit
        ("00000000000", False),       # 11 digits: below min length
        ("0", False),
    ]
    df = spark.createDataFrame([(s0,) for s0, _ in cases], ["n"])
    got_map = {
        r["n"]: r["v"]
        for r in df.select("n", pii.luhn_valid("n").alias("v")).collect()
    }
    for s0, want in cases:
        assert got_map[s0] is want, (s0, got_map[s0])


def test_luhn_panel_pins_validity(spark, sf_smoke):
    """Every injected card is a public test number, so the panel must
    report n_luhn_valid == n_cc on every doc, and last4 must match the
    injected format class."""
    pdf = (
        REGISTRY["pii_luhn_cc_panel"].build(spark, sf_smoke).toPandas()
    )
    assert (pdf["n_luhn_valid"] == pdf["n_cc"]).all()
    with_cc = pdf[pdf["n_cc"] > 0]
    assert len(with_cc) == sum(
        1 for d in pdf["doc_id"] if d % 19 == 0
    )
    last4_by_mod = {0: "1111", 1: "4444", 2: "0005", 3: "1117"}
    for _, r in with_cc.iterrows():
        assert r["cc_last4"] == last4_by_mod[int(r["doc_id"]) % 4], r
