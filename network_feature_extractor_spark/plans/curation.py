"""Training-data curation chain (brief §"beyond the reference"): the
standard LLM-corpus pre-training filter pipeline composed from the
engine's own oracled operators —

    annotate (lang-ID + quality heuristics)   [narrow projections,
                                               fused into the scan]
 -> filter   (allowed languages, min quality) [plain predicates,
                                               Catalyst-pushable]
 -> exact dedup                               [map-combinable
                                               groupBy-min + semi join]

Every stage is individually driver-oracled (ts_lang_id / ts_quality /
dd_exact_groups); `curate_documents` is the composition, itself
re-derived end-to-end in ANSI SQL by the `dd_curation` driver query.
At 100 TB the chain is: one scan -> map-side annotation + filter (no
exchange) -> one map-combinable aggregate + one semi join on
(hash, id). Nothing shuffles document text except the dedup hash join,
which carries md5+id only on the build side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import exact_dedup
from ..operators.textstats import with_lang_id, with_quality_score


def curate_documents(
    docs: DataFrame,
    allowed_langs: Sequence[str] = ("en", "und"),
    min_quality: float = 0.55,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Annotate -> filter -> exact-dedup a documents table. Returns the
    curated rows with ``lang_pred`` and ``quality_score`` attached.

    Both predicates evaluate map-side over the scan; the only exchanges
    in the whole chain are exact_dedup's partial-aggregated keeper
    groupBy and the (hash, id) semi join. Duplicate texts surviving the
    filter resolve to the lowest id (exact_dedup contract)."""
    # id_col=None on the outer call: the quality pass already applied
    # the scan-parallelism guard; a second guard would re-read the FILE
    # layout and re-add an identical exchange (the word_ngrams gotcha)
    annotated = with_lang_id(
        with_quality_score(docs, text_col, id_col=id_col), text_col, id_col=None
    )
    kept = annotated.filter(
        F.col("lang_pred").isin(*list(allowed_langs))
        & (F.col("quality_score") >= float(min_quality))
    )
    slim = kept.select(id_col, text_col, "lang_pred", "quality_score")
    return exact_dedup(slim, text_col=text_col, id_col=id_col)


def curation_report(
    docs: DataFrame,
    allowed_langs: Sequence[str] = ("en", "und"),
    min_quality: float = 0.55,
    text_col: str = "text",
) -> DataFrame:
    """One-row per-stage attrition report for the curation chain — the
    data-quality dashboard primitive (every corpus pipeline wants to
    know WHERE documents died, not just how many survived).

    Attribution order matches ``curate_documents``'s conjunction:
    language first (``n_lang_filtered`` counts docs failing the lang
    test regardless of quality), quality second (among lang-passing
    docs), dedup last (passing docs minus distinct content hashes).
    ONE aggregation pass: all counters are conditional sums (map-side
    combinable); the duplicate counter is an exact COUNT(DISTINCT md5)
    — at extreme scale swap for approx_count_distinct, here exact so a
    SQL oracle can match it bit-for-bit."""
    t = F.col(text_col)
    annotated = with_lang_id(
        with_quality_score(docs, text_col), text_col, id_col=None
    )
    lang_ok = F.col("lang_pred").isin(*list(allowed_langs))
    qual_ok = F.col("quality_score") >= float(min_quality)
    both = lang_ok & qual_ok
    h = F.coalesce(F.md5(t), F.lit("<null>"))
    return annotated.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(~lang_ok, 1).otherwise(0)).cast("long").alias("n_lang_filtered"),
        F.sum(F.when(lang_ok & ~qual_ok, 1).otherwise(0))
        .cast("long")
        .alias("n_quality_filtered"),
        F.sum(F.when(both, 1).otherwise(0)).cast("long").alias("n_pass_filters"),
        F.count_distinct(F.when(both, h)).cast("long").alias("n_curated"),
    ).withColumn(
        "n_dupes_dropped", (F.col("n_pass_filters") - F.col("n_curated")).cast("long")
    )
