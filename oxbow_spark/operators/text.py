"""Text-analysis operators for training-data pipelines.

Language ID (marker-word heuristic), quality scoring, token counting and
document fingerprinting — all pure ``pyspark.sql.functions`` expressions
(whole-stage-codegen'd, no UDFs), so they run at scan speed and their
semantics are mirror-able in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oxbow_spark.operators.dedup import tokens

# marker stopwords per language for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "los", "las", "y", "es", "una"),
}
# fixed precedence for argmax ties (deterministic across engines)
LANG_ORDER = ("en", "de", "fr", "es")

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def _count_in(tok: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tok, lambda t: t.isin(*words)))


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND word/number/punct
    boundaries (a cheap BPE proxy: ~tokens = words + punctuation runs +
    digit runs). Uses one regexp scan, JVM-side.
    """
    pieces = F.regexp_extract_all(col, F.lit(r"([A-Za-z]+|[0-9]+|[^\sA-Za-z0-9])"), 1)
    return F.size(pieces)


# conservative common-subset regexes (Java regex ≡ RE2 for these shapes,
# so the DuckDB oracle matches byte-for-byte)
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def scrub_pii(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(id, n_urls, n_emails, scrubbed_digest): URL/email scrubbing — the
    PII-redaction pass of a training-data pipeline, as pure codegen'd
    regexp expressions (two regexp_replace + two regexp_extract_all, no
    UDFs, scan-speed). URLs are replaced first (<URL>), then emails
    (<EMAIL>) — a URL's userinfo part would otherwise be double-counted
    as an email — and counts follow the same order (emails counted on
    the URL-scrubbed text). The digest stands in for the scrubbed text
    so the oracle hash-checks the exact output."""
    c = F.col(text_col)
    no_urls = F.regexp_replace(c, URL_RE, "<URL>")
    scrubbed = F.regexp_replace(no_urls, EMAIL_RE, "<EMAIL>")
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(c, F.lit(f"({URL_RE})"), 1)).alias("n_urls"),
        F.size(F.regexp_extract_all(no_urls, F.lit(f"({EMAIL_RE})"), 1)).alias("n_emails"),
        F.md5(scrubbed).alias("scrubbed_digest"),
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc stats: chars, tokens, mean token length, punct & stopword ratios."""
    c = F.col(text_col)
    tok = tokens(c)
    n_tok = token_count(c)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_stop = _count_in(tok, STOPWORDS)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        (F.length(F.regexp_replace(c, r"\s+", "")).cast("double")
         / F.greatest(n_tok, F.lit(1)).cast("double")).alias("mean_token_len"),
        (n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")).alias("punct_ratio"),
        (n_stop.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality gate (Gopher-rule-ish, engine-portable arithmetic):
    docs pass when length, mean token length and stopword presence are in
    sane ranges. Returns per-doc boolean + component flags.
    """
    s = text_stats(df, text_col, id_col)
    ok_len = (F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 100000)
    ok_tok = (F.col("mean_token_len") >= 2.0) & (F.col("mean_token_len") <= 12.0)
    ok_stop = F.col("stopword_ratio") >= 0.01
    ok_punct = F.col("punct_ratio") <= 0.3
    return s.select(
        id_col, "n_tokens",
        ok_len.alias("ok_length"), ok_tok.alias("ok_token_len"),
        ok_stop.alias("ok_stopwords"), ok_punct.alias("ok_punct"),
        (ok_len & ok_tok & ok_stop & ok_punct).alias("passes"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-stopword language classifier.

    Counts per-language marker tokens; predicts the argmax with fixed
    precedence (LANG_ORDER) on ties; texts containing CJK codepoints
    classify 'zh' first; no markers at all -> 'und'.
    """
    tok = tokens(F.col(text_col))
    counts = {lg: _count_in(tok, ws) for lg, ws in LANG_MARKERS.items()}
    has_cjk = F.col(text_col).rlike(r"[一-鿿]")
    best = F.greatest(*[counts[lg] for lg in LANG_ORDER])
    pred = F.when(has_cjk, F.lit("zh")).when(best <= 0, F.lit("und"))
    for lg in LANG_ORDER:
        pred = pred.when(counts[lg] == best, F.lit(lg))
    out = [F.col(id_col), pred.alias("pred_lang")]
    out += [counts[lg].alias(f"n_{lg}") for lg in LANG_ORDER]
    return df.select(*out)


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set. Robust to token reordering/duplication; engine-portable.
    """
    tok = F.array_sort(F.array_distinct(tokens(F.col(text_col))))
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", tok)).alias("fingerprint"),
        F.size(tok).alias("n_distinct_tokens"),
    )
