"""PII detection/redaction kernels — the corpus-scrub stage between
quality filtering and dedup.

No counterpart exists in the reference repo (synthetic-datagen has no
PII stage); this family models the standard LLM-training-corpus scrub
(C4, Dolma, FineWeb, RefinedWeb all run an email/phone/IP/SSN redaction
pass before dedup). Everything here is fully relational — per-row
`regexp_extract_all` / `regexp_replace` column expressions, no UDFs, no
shuffle — so at 100 TB the scrub is a map-only stage that pipelines
into whatever comes next.

Engine-parity contract: every pattern is written in the Java-regex
(Spark) ∩ RE2 (DuckDB) common subset — no lookaround, no possessive
quantifiers, no backreferences, ASCII classes only (`\\d` and `\\b` are
ASCII in both engines' defaults). The DuckDB side must pass the ``'g'``
flag to ``regexp_replace`` (Spark always replaces all matches).

The test corpus is digit-free word salad, so PII is INJECTED by a
deterministic doc_id-keyed derivation (same trick as
corpus_snapshot_diff's "derived next release"): both engines render the
same SQL template (only the string cast type differs), so the derived
corpus — emails mid-text, phones in three formats, IPv4s, SSN-shaped
ids appended — is bit-identical on both sides and the detector runs
against realistic in-context matches rather than a toy fixture.

Pattern-disjointness (load-bearing for count parity, pinned in
tests/test_pii.py): on any text the five patterns can never overlap —
SSN's ``\\d{2}`` middle group rejects phone's ``\\d{3}``; IPv4 needs
four dot-separated octets where dotted phones have three groups and the
last phone group has four digits (> an octet's max three); emails
require ``@``; credit cards need 4-digit groups (vs phone's 3-digit
middle) or contiguous 15-16 digit runs no other class can produce. So
per-type extraction counts sum to the redaction count regardless of
scrub order (fixed anyway: email, cc, ssn, phone, ip — PII_TYPES
order).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# NOTE: no leading \b on PHONE — '(' is a non-word char, so a boundary
# between the preceding space and '(' does not exist and \b would
# reject every parenthesized number. The trailing \b stops partial
# matches into longer digit runs.
# CC covers dashed/spaced 4x4 groups and contiguous 15-16 digit PANs;
# its disjointness: phone needs a 3-digit middle group (card groups
# are 4), SSN/IP digit runs are <= 4 resp. <= 3, a contiguous PAN
# inside an email local part has no word boundary before it, and card
# text contains no '@'/'.'-separated octets.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
CC_RE = r"\b(?:(?:\d{4}[- ]){3}\d{4}|\d{15,16})\b"

PII_TYPES: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("cc", CC_RE, "<CC>"),
    ("ssn", SSN_RE, "<SSN>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IP_RE, "<IP>"),
]

# The doc_id-keyed injection, one SQL template for both engines.
# {S} = STRING (Spark) / VARCHAR (DuckDB); everything else is in the
# shared dialect (||, CASE, substr, lpad, %). Emails go MID-text (after
# char 64 — substr is total-length-safe in both engines), the rest are
# appended with word context, so detectors must match in running text.
# doc 0 carries all five types at once (0 ≡ 0 mod everything).
_PII_TEXT_TEMPLATE = """\
CASE WHEN doc_id % 5 = 0 THEN
  substr(text, 1, 64) || ' ' ||
  CASE WHEN doc_id % 10 = 0
    THEN 'u.' || CAST(doc_id AS {S}) || '.x+tag@mail-'
         || CAST(doc_id % 7 AS {S}) || '.example.co.uk'
    ELSE 'user' || CAST(doc_id AS {S}) || '@example.com' END
  || ' ' || substr(text, 65)
ELSE text END
|| CASE WHEN doc_id % 7 = 0 THEN ' call ' ||
     CASE CAST(doc_id % 3 AS INT)
       WHEN 0 THEN '555-' || lpad(CAST((doc_id * 3) % 1000 AS {S}), 3, '0')
                   || '-' || lpad(CAST((doc_id * 7) % 10000 AS {S}), 4, '0')
       WHEN 1 THEN '(555) ' || lpad(CAST((doc_id * 3) % 1000 AS {S}), 3, '0')
                   || ' ' || lpad(CAST((doc_id * 7) % 10000 AS {S}), 4, '0')
       ELSE '555.' || lpad(CAST((doc_id * 3) % 1000 AS {S}), 3, '0')
            || '.' || lpad(CAST((doc_id * 7) % 10000 AS {S}), 4, '0')
     END
   ELSE '' END
|| CASE WHEN doc_id % 11 = 0 THEN ' origin 10.'
     || CAST(doc_id % 256 AS {S}) || '.'
     || CAST((doc_id * 7) % 256 AS {S}) || '.'
     || CAST((doc_id * 13) % 256 AS {S})
   ELSE '' END
|| CASE WHEN doc_id % 13 = 0 THEN ' id '
     || lpad(CAST(100 + doc_id % 899 AS {S}), 3, '0') || '-'
     || lpad(CAST(10 + doc_id % 89 AS {S}), 2, '0') || '-'
     || lpad(CAST(doc_id % 10000 AS {S}), 4, '0')
   ELSE '' END
|| CASE WHEN doc_id % 19 = 0 THEN ' card ' ||
     CASE CAST(doc_id % 4 AS INT)
       WHEN 0 THEN '4111-1111-1111-1111'
       WHEN 1 THEN '5555 5555 5555 4444'
       WHEN 2 THEN '378282246310005'
       ELSE '6011111111111117'
     END
   ELSE '' END"""

PII_TEXT_SPARK_SQL = _PII_TEXT_TEMPLATE.format(S="STRING")
PII_TEXT_DUCK_SQL = _PII_TEXT_TEMPLATE.format(S="VARCHAR")


def pii_text() -> Column:
    """The deterministically PII-injected document text (Spark side).

    Pure column expression over (doc_id, text) — no UDF, no shuffle."""
    return F.expr(PII_TEXT_SPARK_SQL)


def pii_count(col: Column | str, pattern: str) -> Column:
    """Number of matches of one PII pattern in a text column (int)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def pii_total(col: Column | str) -> Column:
    """Total PII matches across all PII_TYPES classes (five today) —
    the Spark twin of the oracle-side _PII_TOTAL_DUCK sum; extending
    PII_TYPES extends this automatically."""
    c = F.col(col) if isinstance(col, str) else col
    out = None
    for _, pattern, _ in PII_TYPES:
        term = pii_count(c, pattern)
        out = term if out is None else out + term
    return out


def luhn_valid(num: Column | str) -> Column:
    """Luhn checksum validity of a DIGITS-ONLY string column, as a pure
    higher-order-function expression (no UDF): from the rightmost
    digit, every second digit doubles (minus 9 past 9), and the sum
    must divide by 10. The digit string is bound once per row
    (functions/text.bind_once — per-element references to an outer
    expression re-inline it, the O(n²) trap; trivial at PAN length but
    the rule is the rule)."""
    from .text import bind_once

    c = F.col(num) if isinstance(num, str) else num

    def build(n: Column) -> Column:
        ln = F.length(n)

        def term(i: Column) -> Column:
            d = F.substring(n, i, 1).cast("int")
            dbl = d * 2
            return F.when(
                ((ln - i) % 2) == 0, d  # odd position from the right
            ).otherwise(F.when(dbl > 9, dbl - 9).otherwise(dbl))

        total = F.aggregate(
            F.transform(F.sequence(F.lit(1), ln), term),
            F.lit(0),
            lambda a, x: a + x,
        )
        return (ln >= 12) & (total % 10 == 0)

    return bind_once(c, build)


def duck_luhn_sql(expr: str) -> str:
    """The DuckDB twin of luhn_valid over a digits-only SQL expression.
    DuckDB list lambdas don't capture a bind-once variable the way the
    Spark side does, so ``expr`` repeats — callers should pass a cheap
    expression (a list element / stripped match, never a whole-doc
    derivation)."""
    body = (
        "(length({n}) >= 12 AND list_sum(list_transform("
        "generate_series(1, CAST(length({n}) AS INT)), i -> "
        "CASE WHEN (length({n}) - i) % 2 = 0 "
        "THEN CAST(substr({n}, i, 1) AS INT) "
        "ELSE CASE WHEN CAST(substr({n}, i, 1) AS INT) * 2 > 9 "
        "THEN CAST(substr({n}, i, 1) AS INT) * 2 - 9 "
        "ELSE CAST(substr({n}, i, 1) AS INT) * 2 END END)) % 10 = 0)"
    )
    return body.replace("{n}", f"({expr})")


def pii_redact(col: Column | str) -> Column:
    """Redact every PII match with its typed placeholder, in the fixed
    PII_TYPES order (placeholders contain no digits or '@', so later
    patterns can never match inside an earlier replacement)."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pattern, token in PII_TYPES:
        out = F.regexp_replace(out, pattern, token)
    return out


def duck_redact_sql(expr: str) -> str:
    """The DuckDB twin of pii_redact over an SQL expression — nested
    regexp_replace in the same fixed order, with the 'g' flag DuckDB
    needs to replace ALL matches (Spark always does)."""
    out = expr
    for _, pattern, token in PII_TYPES:
        out = f"regexp_replace({out}, '{pattern}', '{token}', 'g')"
    return out
