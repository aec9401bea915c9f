"""PII redaction for LLM training corpora.

:func:`pii_scrub` rewrites a text column with deterministic placeholder
tokens for emails, IPv4 addresses, and international phone numbers, and
reports per-category match counts — the standard scrub pass a corpus
runs before training (the reference has no text-pipeline tier; this op
belongs to the LLM-data extension alongside dedup/quality filtering).

Rules are applied in a fixed order (email → ip → phone), each counting
on the output of the previous rule, so counts equal replacements made
and the composition is order-deterministic. Patterns use ONLY explicit
character classes — no backslash escapes ("[.]" not "\\."), no word
boundaries — because Spark SQL string literals process backslash
escapes while DuckDB's RE2 does not, and RE2 lacks some Java regex
features; within this subset the two engines match byte-for-byte, which
is what makes the DuckDB oracle exact.

100 TB shape: a single narrow scan — pure JVM ``regexp_replace`` /
``regexp_count`` column expressions, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — patterns are valid and identical in
# Java regex and RE2; keep them backslash-free (see module docstring).
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}", "<EMAIL>"),
    # octets bounded to 0-255 so version-ish strings ("v1.2.300.4") don't
    # count as IPs; still unanchored (RE2 has no lookaround and word
    # boundaries need backslashes), so a longer dotted run like
    # '1.2.3.4.5' scrubs its first four octets — documented overmatch.
    (
        "ip",
        "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
        "([.](25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}",
        "<IP>",
    ),
    ("phone", "[+][0-9]{7,15}", "<PHONE>"),
)


def pii_scrub(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "scrubbed",
) -> DataFrame:
    """Redact PII from ``text_col``. Returns (id_col, out_col,
    n_email, n_ip, n_phone)."""
    df = docs.select(F.col(id_col), F.col(text_col).alias("__t0"))
    for i, (name, pat, repl) in enumerate(PII_RULES):
        df = df.withColumn(
            f"n_{name}", F.expr(f"regexp_count(__t{i}, '{pat}')")
        ).withColumn(
            f"__t{i + 1}", F.expr(f"regexp_replace(__t{i}, '{pat}', '{repl}')")
        )
    return df.select(
        id_col,
        F.col(f"__t{len(PII_RULES)}").alias(out_col),
        *[F.col(f"n_{name}") for name, _, _ in PII_RULES],
    )


def oracle_pii_scrub_sql(
    source_sql: str = "SELECT doc_id, text FROM documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "scrubbed",
) -> str:
    """DuckDB SQL reproducing :func:`pii_scrub` exactly (same patterns,
    same rule order; RE2 'g' flag = Spark's replace-all default)."""
    sql = f"SELECT {id_col}, {text_col} AS __t0 FROM ({source_sql})"
    for i, (name, pat, repl) in enumerate(PII_RULES):
        sql = (
            f"SELECT {id_col}, "
            f"len(regexp_extract_all(__t{i}, '{pat}')) AS n_{name}, "
            f"regexp_replace(__t{i}, '{pat}', '{repl}', 'g') AS __t{i + 1}"
            + (
                "".join(f", n_{n}" for n, _, _ in PII_RULES[:i])
            )
            + f" FROM ({sql})"
        )
    counts = ", ".join(f"n_{name}" for name, _, _ in PII_RULES)
    return (
        f"SELECT {id_col}, __t{len(PII_RULES)} AS {out_col}, {counts} "
        f"FROM ({sql})"
    )
