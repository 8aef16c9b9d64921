"""Text-analysis operators for training-data pipelines (north-star scope,
SURVEY.md §7 step 8): language ID, quality scoring, token counting, document
fingerprinting.

All native Column expressions — JVM-side, codegen'd, no Python UDFs — so a
100 TB documents table processes at parquet-scan speed with zero shuffles
(these are per-row maps; Catalyst fuses them into the scan stage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int32, rolling_hash

#: Tiny per-language marker-word sets for the n-gram/stopword heuristic.
#: Order matters: ties resolve to the earlier language in this dict.
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "les", "et", "des", "une"],
}

#: BPE-ish pre-tokenizer: letter runs | digit runs | single other non-space.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_PUNCT_PATTERN = r"[^A-Za-z0-9\s]"

#: Every character the punct pattern does NOT count, for the
#: translate-based spelling: ASCII alphanumerics plus Java regex \s
#: ([ \t\n\x0B\f\r] — the class the Spark side always used).
_NON_PUNCT_CHARS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    " \t\n\x0b\x0c\r"
)


def words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def _hits(ws: Column, markers: list[str]) -> Column:
    return F.size(F.filter(ws, lambda w: w.isin(*markers)))


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword ratios + a deterministic quality score.

    Spelled as STAGED projections that reference prior columns by NAME:
    the former single-expression spelling re-inlined the split array and
    the punct count into every ratio and into the quality score, and —
    higher-order functions being CodegenFallback, outside codegen's
    common-subexpression elimination — evaluated the regex split ~4× per
    row (measured 2.66 s → 1.0 s at sf1.0). CollapseProject keeps the
    stages separate because each intermediate alias is non-cheap and
    referenced more than once downstream. The punct count itself uses
    translate() (one char-table pass) instead of regexp_replace building
    a scrubbed copy of the whole document: identical count — translate
    deletes exactly the characters the regex class keeps — at a third of
    the cost."""
    t = F.col(text_col)
    n_chars = F.length(t)
    staged = (
        docs.withColumn("_ws", words(t))
        .withColumns(
            {
                "n_chars_actual": n_chars.cast("long"),
                "n_words": F.size(F.col("_ws")).cast("long"),
                "_punct": F.length(F.translate(t, _NON_PUNCT_CHARS, "")),
                "_stop_hits": _hits(F.col("_ws"), LANG_MARKERS["en"]),
            }
        )
        .withColumns(
            {
                # Empty-text guard (mirrored in the oracle SQL): ratios
                # are NULL, not NaN/error, when the denominator is 0.
                "punct_ratio": F.when(
                    F.col("n_chars_actual") > 0,
                    F.col("_punct").cast("double") / F.col("n_chars_actual"),
                ),
                "stopword_ratio": F.when(
                    F.col("n_words") > 0,
                    F.col("_stop_hits").cast("double") / F.col("n_words"),
                ),
            }
        )
        .withColumn(
            "quality_score",
            F.log(1 + F.col("n_words"))
            * (1 - F.col("punct_ratio"))
            * (0.5 + 0.5 * F.col("stopword_ratio")),
        )
    )
    return staged.drop("_ws", "_punct", "_stop_hits")


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens + chars-per-token."""
    t = F.col(text_col)
    ws_tokens = F.size(words(t))
    bpe_tokens = F.size(F.regexp_extract_all(t, F.lit(BPE_PATTERN), F.lit(0)))
    return (
        docs.withColumn("ws_tokens", ws_tokens.cast("long"))
        .withColumn("bpe_tokens", bpe_tokens.cast("long"))
        .withColumn(
            "chars_per_token",
            F.when(ws_tokens > 0, F.length(t).cast("double") / ws_tokens),
        )
    )


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID with a deterministic left-to-right argmax
    (strictly-greater beats, ties keep the earlier language; no hits →
    'und').

    The hit counts land in ONE array column in their own projection, then
    argmax = array_position(first occurrence) of array_max — same
    first-max-wins semantics as the oracle's CASE chain. (A nested
    when-chain doubles the hit expressions per language and Catalyst
    re-inlines the split per reference: 1.8 s → 0.4 s at sf0.1.)
    """
    ws = words(F.col(text_col))
    langs = list(LANG_MARKERS)
    hits_arr = F.array(*[_hits(ws, LANG_MARKERS[lang]) for lang in langs])
    tmp = docs.withColumn("_hits", hits_arr)
    best_h = F.array_max(F.col("_hits"))
    idx = F.array_position(F.col("_hits"), best_h).cast("int")
    lang = F.element_at(F.array(*[F.lit(lang) for lang in langs]), idx)
    return (
        tmp.withColumn(
            "lang_pred", F.when(best_h > 0, lang).otherwise(F.lit("und"))
        )
        .withColumn("lang_hits", best_h.cast("long"))
        .drop("_hits")
    )


def with_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Two content fingerprints: md5-prefix int and a 31-base rolling hash."""
    t = F.col(text_col)
    return docs.withColumn("fp_md5", md5_int32(t)).withColumn(
        "fp_roll", rolling_hash(t)
    )
