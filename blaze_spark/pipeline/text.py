"""Text-analysis operators over a documents table: language-ID, quality
scoring, token counting, fingerprinting.

Every formula is deliberately expressible in ANSI SQL (length / regexp
counts / md5) so the DuckDB oracle can mirror it exactly — and every
expression is a built-in Column function (whole-stage codegen; a 100 TB
documents scan stays in the JVM with the text column pruned to exactly
what each operator reads).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import Table, _unary_pass

# language-distinctive stopword regexes (word-boundary anchored; RE2- and
# java.util.regex-compatible so Spark and the DuckDB oracle agree)
LANG_PATTERNS = {
    "en": r"\b(the|and|of|to|in|is)\b",
    "es": r"\b(el|la|los|las|que|y|en)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "fr": r"\b(le|les|et|des|est|une)\b",
}
CJK_PATTERN = "[一-鿿]"
PUNCT_PATTERN = r"[a-z0-9\s]"


def _nmatches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def _tokens(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), r"\s+")


def language_id(t: Table, text_col: str = "text") -> Table:
    """n-gram/stopword-heuristic language ID.  Adds ``pred_lang``.

    Deterministic argmax with fixed priority order (zh > en > es > de > fr)
    so ties resolve identically everywhere.

    The argmax is ONE sorted 4-struct array, not a CASE chain comparing
    score pairs: a chain references each stopword count up to four times,
    and when ``pred_lang`` lands in a FILTER the predicate is pushed into
    the parquet scan's per-row DataFilter, which evaluates interpreted and
    without cross-reference subexpression elimination — every reference is
    a full regex pass over the document.  Measured at sf3 (150k docs):
    chain 3.5 s vs argmax 1.2 s for ``pred_lang = 'en'``, row-identical
    output (ties resolve by the struct's priority field, same order as
    the chain)."""
    c = F.lower(F.col(text_col))
    entries = [F.struct((-_nmatches(c, p)).alias("neg"),
                        F.lit(i).alias("prio"), F.lit(k).alias("lang"))
               for i, (k, p) in enumerate(LANG_PATTERNS.items())]
    top = F.array_sort(F.array(*entries))[0]
    zh = _nmatches(F.col(text_col), CJK_PATTERN)
    pred = (
        F.when(zh > 0, F.lit("zh"))
        .when(top["neg"] < 0, top["lang"])
        .otherwise(F.lit("und"))
    )
    return _unary_pass(t, t.df.withColumn("pred_lang", pred),
                       "language_id", text_col)


def quality_features(t: Table, text_col: str = "text") -> Table:
    """Quality-scoring features: token count, avg token length, punctuation
    ratio, stopword ratio, composite ``quality`` in [0,1]."""
    c = F.col(text_col)
    lc = F.lower(c)
    n_chars = F.length(c)
    n_tokens = F.size(F.split(F.trim(c), r"\s+"))
    punct_n = F.length(F.regexp_replace(lc, PUNCT_PATTERN, ""))
    stop_n = _nmatches(lc, LANG_PATTERNS["en"])
    punct_ratio = F.round(punct_n / n_chars, 4)
    quality = F.round(
        (F.lit(1.0) - punct_n / n_chars)
        * F.least(F.lit(1.0), n_tokens / F.lit(100.0)),
        4,
    )
    return _unary_pass(
        t,
        t.df.withColumns({
            "n_tokens": n_tokens.cast(T.IntegerType()),
            "avg_token_len": F.round(n_chars / n_tokens, 4),
            "punct_ratio": punct_ratio,
            "stopword_ratio": F.round(stop_n / n_tokens, 4),
            "quality": quality,
        }),
        "quality_features", text_col,
    )


def token_stats(t: Table, text_col: str = "text", group_col: str | None = None) -> Table:
    """Token counting — whitespace tokenization plus a BPE-ish sub-token
    estimate (alnum runs + non-space punctuation each count as a token)."""
    c = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(c), r"\s+"))
    bpe_ish = F.size(F.regexp_extract_all(F.lower(c), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), F.lit(0)))
    out = t.df.withColumns({
        "n_tokens": ws_tokens.cast(T.IntegerType()),
        "n_subtokens": bpe_ish.cast(T.IntegerType()),
    })
    if group_col is None:
        return _unary_pass(t, out, "token_stats", text_col)
    return _unary_pass(
        t,
        out.groupBy(group_col).agg(
            F.sum("n_tokens").cast(T.LongType()).alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.sum("n_subtokens").cast(T.LongType()).alias("total_subtokens"),
        ),
        "token_stats", text_col, group_col,
    )


def fingerprint(t: Table, text_col: str = "text") -> Table:
    """Document fingerprint: md5 of the normalization-canonical text
    (lowercased, non-alphanumerics stripped).  Stable across engines, used
    as the exact-dedup key."""
    canon = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    return _unary_pass(
        t,
        t.df.withColumn("fingerprint", F.md5(F.encode(canon, "UTF-8"))),
        "fingerprint", text_col,
    )


# token_stats joined the wire dialect (its node carries text_col +
# optional group_col), so it needs no remote guard — all six text/
# curation passes now run server-side on a RemoteTable
