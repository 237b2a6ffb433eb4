"""Composite training-data pipeline: the operators wired end-to-end.

The canonical LLM-corpus cleaning pass, built entirely from this
package's primitives so the composition itself is oracle-checkable:

    documents
      -> exact dedup (keep canonical doc per content hash)
      -> language filter (marker-argmax lang id)
      -> quality filter (score threshold)
      -> per-doc stats projection (tokens, chars, fingerprint)

Shuffle budget: ONE shuffle (the dedup groupBy); everything else is
narrow column work over the staged normalized text. At 100 TB this runs
as a single wide stage + one exchange, and the output is ready for
partitioned write via sources.sinks.write_table(partition_by=['lang']).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import spread
from . import textops
from .dedup import normalized_text


def clean_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cleaned-corpus rows: canonical, language-matched, quality-passed.

    Returns (doc_id, lang_pred, quality, n_tokens, n_chars, fingerprint).
    Canonical = lowest id among exact-content duplicates (the reference's
    first-seen-wins dedup, script.hpp:246-268, made deterministic by id
    order instead of arrival order).
    """
    staged = spread(docs).select(
        F.col(id_col),
        F.col(text_col),
        normalized_text(text_col).alias("_norm"),
    )
    # canonical id per content hash — one shuffle
    hashed = staged.withColumn("_h", F.sha2(F.col("_norm"), 256))
    canon = hashed.groupBy("_h").agg(F.min(id_col).alias("_canon_id"))
    deduped = hashed.join(canon, "_h").filter(F.col(id_col) == F.col("_canon_id"))

    # _nd (non-deterministic) blocks PushPredicateThroughNonJoin from
    # re-inlining the filter below into this projection: inlined, the
    # lang/quality expression tree repeats the regex-hits array ~25x,
    # overflows janino's method limit, and the whole filter falls back
    # to interpreted eval at the scan (re-running every regex per
    # reference). Staged, the regexes run once per row and the filter
    # is a two-column comparison inside whole-stage codegen.
    scored = deduped.select(
        id_col,
        textops.lang_id_from(textops.lang_hits(F.col("_norm"))).alias("lang_pred"),
        textops.quality_score(text_col).alias("quality"),
        textops.token_count(text_col).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        F.col("_h").alias("fingerprint"),  # == sha2(norm), already computed
        F.monotonically_increasing_id().alias("_nd"),
    )
    # `_nd >= 0` is always true but not constant-foldable, so _nd stays
    # referenced (ColumnPruning would otherwise drop it and re-enable
    # the pushdown this guard exists to block).
    return scored.filter(
        (F.col("_nd") >= 0)
        & (F.col("lang_pred") == lang)
        & (F.col("quality") >= min_quality)
    ).drop("_nd")
