"""PII detection and redaction over text columns — native regexp expressions.

Training-data curation scrubs obvious PII (emails, phone numbers) before
anything leaves the pipeline. Both detectors are RE2-compatible regexes (no
backreferences, no lookaround) so the exact same pattern runs in Spark's
JVM regex, DuckDB, and any downstream engine — the q39 oracle verifies the
counts and the redacted text hash value-for-value.

Shape at scale: pure per-row projections inside whole-stage codegen — no
UDF, no shuffle, no state. Redaction cost is linear in bytes scanned, which
is the floor for any scrubber.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# +1 / (555) 123-4567 style North-American numbers with -, ., or space
# separators; the country prefix is one optional group so a bare leading
# space is never consumed into the match (keeps redaction byte-exact)
PHONE_RE = r"(\+?1[-. ]?)?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"

EMAIL_TOKEN = "[EMAIL]"
PHONE_TOKEN = "[PHONE]"


def email_count_col(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0)))


def phone_count_col(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), F.lit(0)))


def redact_col(text: Column) -> Column:
    """Emails replaced first so a phone-looking local part can't double-fire."""
    t = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    return F.regexp_replace(t, PHONE_RE, PHONE_TOKEN)


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds `n_emails`, `n_phones`, and a redacted `text` (in place)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return (
        df.withColumn("n_emails", email_count_col(t))
        .withColumn("n_phones", phone_count_col(t))
        .withColumn(text_col, redact_col(t))
    )
