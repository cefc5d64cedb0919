"""Sparse lexical retrieval over the document corpus — the BM25
scoring path a training-data pipeline uses for query-based corpus
curation (mining topical subsets, building retrieval-augmented
eval sets, hard-negative selection for embedding training).

Okapi BM25 (Robertson & Spärck Jones; the standard k1/b form):

    score(d, Q) = sum_t  idf(t) * tf(t,d) * (k1 + 1)
                        / (tf(t,d) + k1 * (1 - b + b * |d| / avgdl))
    idf(t)      = ln( (N - df(t) + 0.5) / (df(t) + 0.5) + 1 )

Distributed shape — scoring a FIXED query needs no inverted index:

1. one tokenize pass feeds ONE per-document aggregation producing
   document length AND the per-term tf columns (conditional counts
   over the literal term list) — so there is exactly one corpus-sized
   shuffle, keyed by doc, and no doc-keyed join at all;
2. corpus constants (N, avgdl, df per query term) are one 1-row
   aggregate over that slim per-doc table, broadcast back — never a
   driver-side collect of per-document state;
3. per-term scores are quantized to 1e-6 fixed point BEFORE the
   per-document sum, so the reduction is integer arithmetic —
   associative, order-independent, and bit-identical across engines
   and partitionings;
4. the top-k is `orderBy(...).limit(k)` → Spark plans
   TakeOrderedAndProject (per-partition heaps + driver merge of
   k·P rows), not a global sort exchange.

At 100 TB the per-doc table is materialized twice (constants pass +
scoring pass) — persist it between the passes on a real cluster; at
bench scale recomputation is cheaper than the cache write.

No reference counterpart (the reference has no text retrieval) —
this is pipeline-extension surface, same family as text.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000  # fixed-point denominator for cross-engine float canon


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int | None = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_fp: bool = False,
) -> DataFrame:
    """Score every document against ``query_terms`` with Okapi BM25
    and return the top ``k`` by (score desc, doc_id) — the doc-id
    tie-break makes the global limit deterministic.

    Returns (doc_id, score, n_terms_hit).  ``k=None`` returns ALL hits
    unordered (callers rank distributedly, e.g. rrf_hybrid_retrieval);
    ``with_fp=True`` adds the exact integer ``score_fp`` column the
    6-dp ``score`` is derived from.
    """
    terms = sorted(set(query_terms))
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(text_col), r"\s+")).alias("tok"),
    ).where(F.length("tok") > 0)

    # ONE corpus shuffle: doc length + per-query-term tf as conditional
    # counts (|Q| extra agg buffers per doc — Q is a literal handful)
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.count(F.when(F.col("tok") == t, 1)).alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )

    # corpus constants: N, avgdl, df per term — one 1-row broadcast
    consts = F.broadcast(
        per_doc.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            *[
                F.count(F.when(F.col(f"_tf{i}") > 0, 1)).alias(f"_df{i}")
                for i in range(len(terms))
            ],
        )
    )

    def term_tsq(i: int):
        tf = F.col(f"_tf{i}")
        idf = F.log(
            (F.col("n_docs") - F.col(f"_df{i}") + 0.5)
            / (F.col(f"_df{i}") + 0.5)
            + 1.0
        )
        denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        # quantize each term separately (exactly as a per-(doc, term)
        # table would) so the sum over terms is an exact integer sum
        score = F.round(idf * tf * (k1 + 1.0) / denom * QUANT, 0).cast("long")
        return F.when(tf > 0, score).otherwise(F.lit(0).cast("long"))

    hits = sum(
        (F.when(F.col(f"_tf{i}") > 0, 1).otherwise(0) for i in range(len(terms))),
        F.lit(0),
    )
    tsq = sum(
        (term_tsq(i) for i in range(len(terms))), F.lit(0).cast("long")
    )
    cols = [
        F.col(id_col),
        F.round(tsq / float(QUANT), 6).alias("score"),
        hits.cast("bigint").alias("n_terms_hit"),
    ]
    if with_fp:
        cols.insert(2, tsq.alias("score_fp"))
    out = (
        per_doc.crossJoin(consts)
        .select(*cols)
        .where(F.col("n_terms_hit") > 0)
    )
    if k is None:
        return out
    return out.orderBy(F.desc("score"), id_col).limit(k)
