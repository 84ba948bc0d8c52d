"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting. All native Spark
expressions (split/regexp/length), engine-portable for oracle checks."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "en"],
    "de": ["der", "die", "das", "und", "zu", "ist"],
    "fr": ["le", "la", "de", "et", "que", "est"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish subword estimate = chars/4 is also
    exposed as `subword_estimate`)."""
    return F.size(F.split(text, " "))


def subword_estimate(text: Column) -> Column:
    return F.ceil(F.length(text) / 4).cast("bigint")


def nonalpha_ratio(text: Column) -> Column:
    """Share of characters outside [a-z0-9 ] after lowercasing — punctuation/
    noise proxy for quality scoring."""
    cleaned = F.regexp_replace(F.lower(text), "[a-z0-9 ]", "")
    return F.length(cleaned) / F.length(text)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    toks = F.split(text, " ")
    hits = F.size(F.filter(toks, lambda t: t.isin(words)))
    return hits / F.size(toks)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-doc quality features: n_tokens, n_chars, nonalpha_ratio,
    stopword_ratio (en), mean_token_len."""
    t = F.col(text_col)
    return (df
            .withColumn("n_tokens", token_count(t))
            .withColumn("n_chars_calc", F.length(t))
            .withColumn("nonalpha_ratio", nonalpha_ratio(t))
            .withColumn("stopword_ratio", stopword_ratio(t, "en"))
            .withColumn("mean_token_len",
                        (F.length(t) - F.col("n_tokens") + 1) / F.col("n_tokens")))


def _membership(words: list[str]):
    # NB: must stay a ONE-argument lambda — F.filter treats a second
    # parameter as the element index
    return lambda t: t.isin(words)


def lang_scores(text: Column) -> list[Column]:
    """Stopword-hit ratio per language (n-gram-free heuristic lang-ID)."""
    toks = F.split(text, " ")
    out = []
    for lang, words in STOPWORDS.items():
        hits = F.size(F.filter(toks, _membership(words)))
        out.append((hits / F.size(toks)).alias(f"score_{lang}"))
    return out


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language by max stopword-hit ratio; ties break in the fixed
    language order en > es > de > fr (deterministic)."""
    t = F.col(text_col)
    scored = df.select("*", *lang_scores(t))
    langs = list(STOPWORDS)
    # greatest + cascaded equality check keeps tie-breaking deterministic
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.when(F.col(f"score_{langs[0]}") == best, langs[0])
    for lg in langs[1:]:
        pred = pred.when(F.col(f"score_{lg}") == best, lg)
    return scored.withColumn("predicted_lang", pred)


def fingerprint(text: Column) -> Column:
    """Normalized document fingerprint: lowercase, collapse whitespace, md5."""
    return F.md5(F.regexp_replace(F.lower(text), r"\s+", " "))
