"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.9 /
north-star mandate): tokenization stats, n-grams, language-ID heuristic,
quality scoring, token-count estimation, fingerprinting.

Everything is built-in column expressions — zero Python on the row path.
At 100 TB these run as a single scan-project-aggregate per query; the
only shuffles are the final groupBys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny function-word lists per language for the language-ID heuristic.
#: Deliberately small and public-knowledge; the operator shape (score =
#: token hits per language, argmax with name tie-break) is what scales.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "of", "and", "is", "to", "in", "that"),
    "es": ("el", "la", "de", "que", "y", "los", "es", "una"),
    "fr": ("le", "la", "les", "de", "et", "est", "une", "dans"),
    "zh": ("de", "le", "shi", "bu", "wo", "you", "zai", "ta"),
}

#: shared stopword set for quality scoring.
STOPWORDS = ("the", "a", "of", "and", "is", "to", "in", "that", "it", "on")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (fixture text is pre-normalized; a real
    corpus would lower+strip punctuation first — see quality_score)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-flavored token estimate: count maximal runs of letters, runs
    of digits, and single non-alphanumeric glyphs — a cheap, regex-only
    stand-in for a real tokenizer's token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"))


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    wordlist = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordlist, t)))


def lang_scores(toks: Column) -> list[Column]:
    """One hit-count column per candidate language."""
    return [
        stopword_hits(toks, words).alias(f"score_{lang}")
        for lang, words in sorted(LANG_MARKERS.items())
    ]


def lang_pick_expr() -> Column:
    """Argmax over score_<lang> columns, first-in-alphabetical-order on
    ties — a chained CASE WHEN s_x >= greatest(rest), which the SQL
    oracle states verbatim."""
    langs = sorted(LANG_MARKERS)
    expr: Column | None = None
    for i, lang in enumerate(langs[:-1]):
        rest = [F.col(f"score_{rl}") for rl in langs[i + 1 :]]
        cond = F.col(f"score_{lang}") >= (F.greatest(*rest) if len(rest) > 1 else rest[0])
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr.otherwise(langs[-1])


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score.

    All ratios are +-*/ of counts → IEEE-exact, no rounding needed for
    oracle parity.
    """
    t = tokens(text_col)
    n_tok = F.size(t).cast("double")
    n_chars = F.length(text_col).cast("double")
    stop = stopword_hits(t, STOPWORDS).cast("double")
    uniq = F.size(F.array_distinct(t)).cast("double")
    avg_len = (n_chars - (n_tok - 1)) / n_tok  # chars net of separators
    stop_ratio = stop / n_tok
    uniq_ratio = uniq / n_tok
    score = stop_ratio * 0.25 + uniq_ratio * 0.5 + F.least(avg_len / 10.0, F.lit(1.0)) * 0.25
    return df.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        uniq_ratio.alias("unique_ratio"),
        score.alias("quality_score"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two fingerprints per document: exact (md5 of text) and
    order-insensitive content fingerprint (md5 of sorted distinct
    tokens) — the groupBy key for exact / shuffled-copy dedup."""
    t = tokens(text_col)
    return df.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("fp_exact"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(t)))).alias("fp_content"),
    )


def sliding_concat(arr: Column, width: int) -> Column:
    """Width-w sliding windows over an array, space-joined — n shifted
    slices folded with zip_with, so the whole expansion is O(n·w) per
    row. (The obvious transform+slice form re-slices per position:
    O(n²), measured ~5× slower on the documents fixture.)

    ``n_out`` is clamped at 0 so arrays shorter than ``width`` (including
    the 1-token and empty-text cases, where ``split`` yields ``[""]``)
    produce an empty result instead of a negative-length ``slice`` that
    throws INVALID_PARAMETER_VALUE.LENGTH at runtime."""
    n_out = F.greatest(F.lit(0), F.size(arr) - (width - 1))
    parts = [F.slice(arr, i + 1, n_out) for i in range(width)]
    acc = parts[0]
    for p in parts[1:]:
        acc = F.zip_with(acc, p, lambda x, y: F.concat(x, F.lit(" "), y))
    return acc


def ngrams(col: Column | str, n: int = 2) -> Column:
    """Word n-grams as an array column — pure exprs, no window, no
    shuffle; the per-row equivalent of a list comprehension, so a SQL
    oracle can state the same thing."""
    return sliding_concat(tokens(col), n)


def max_multiplicity(arr: Column) -> Column:
    """Highest occurrence count of any element in a string array — the
    'top n-gram fraction' numerator of Gopher-style repetition rules.

    Shape matters: the naive `array_max(transform(array_distinct(a),
    x -> size(filter(a, y -> y = x))))` is O(distinct x n) per row and,
    because higher-order functions evaluate interpreted (outside
    whole-stage codegen), measured ~50x slower at sf0.1 (88s -> 1.8s
    for a corpus-wide sum). This implementation sorts once and folds a
    (prev, run, best) struct over adjacent equal runs — O(n log n),
    one pass, same result for non-null elements. Empty arrays return 0
    (the naive form returns NULL).
    """
    s = F.array_sort(arr)
    return F.aggregate(
        s,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
