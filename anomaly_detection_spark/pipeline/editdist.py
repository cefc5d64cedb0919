"""Edit-distance near-duplicate pairs via pigeonhole segment blocking.

Finds document pairs whose normalized text prefixes are within
Levenshtein distance 1 — the "same title, one typo" class of near-dups
that token-set methods (MinHash / SimHash) are blind to, because a
single character edit barely moves a shingle set.

100 TB shape — NEVER the all-pairs cross join.  The PassJoin-style
pigeonhole argument (Li, Deng & Feng, "PassJoin: A Partition-based
Method for Similarity Joins", PVLDB 5(3), 2011): one edit touches one
position, so for prefixes of length ≥ P-2 at least one of two fixed
segments — the first ``A`` characters or the last ``B`` characters — is
untouched and aligned.  Two hash-partitioned equi-joins on those
segment keys therefore enumerate a complete candidate set; an exact
``levenshtein`` verify (JVM-side, 24-char strings) removes the false
candidates.  Shorter prefixes (< P-2 chars — rare for real documents)
fall into a per-length-band bucket that pairs exhaustively; its size is
bounded by the count of near-empty documents, not the corpus.

Completeness proof sketch for d = 1, A = P//2, B = P - A - 1
(P=24 → A=12, B=11):
- substitution at position p, both lengths l ≥ A+B: p ≤ A keeps the
  last ``l - p ≥ B`` characters aligned → right-B keys equal;
  p > A → left-A keys equal.
- deletion/insertion (longer side length la ≥ A+B): edit at p ≤ A
  leaves the last ``la - p ≥ B`` characters equal as end-aligned
  suffixes → right-B equal; p > A → left-A equal.
- both lengths ≤ P-2 → short band (paired exhaustively, |Δlen| ≤ 1).
The long/short buckets overlap at length exactly P-2 so boundary pairs
(P-1, P-2) are seen by the long joins; duplicates are removed with a
distinct on the id pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_near_duplicates(
    docs: DataFrame,
    prefix_len: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs (id_a < id_b) with levenshtein(prefix_a, prefix_b) <= 1,
    prefix = lower(first ``prefix_len`` chars) with every non-ASCII
    character folded to ``#``.  The ASCII fold is part of the stated
    normalization (like lowercasing): it makes character distance equal
    byte distance, so engines whose ``levenshtein`` counts bytes
    (DuckDB) agree exactly with Spark's character-based one — and a
    one-character CJK typo still reads as one edit, not three.
    Exact — blocking is provably complete for distance 1 (module
    docstring).

    Output: (id_a, id_b, pfx_a, pfx_b, edit_distance).
    """
    a_len = prefix_len // 2
    b_len = prefix_len - a_len - 1
    long_min = a_len + b_len - 1  # == prefix_len - 2

    p = docs.select(
        F.col(id_col).alias("id"),
        F.regexp_replace(
            F.lower(F.substring(text_col, 1, prefix_len)),
            "[^\\x00-\\x7F]", "#",
        ).alias("pfx"),
    ).withColumn("l", F.length("pfx"))

    lng = p.where(F.col("l") >= long_min)
    left_key = F.substring("pfx", 1, a_len)
    right_key = F.substring("pfx", -b_len, b_len)

    def _self_join(keyed: DataFrame) -> DataFrame:
        a = keyed.select(
            F.col("k"), F.col("id").alias("id_a"), F.col("pfx").alias("pfx_a")
        )
        b = keyed.select(
            F.col("k"), F.col("id").alias("id_b"), F.col("pfx").alias("pfx_b")
        )
        return a.join(b, "k").where(F.col("id_a") < F.col("id_b")).drop("k")

    cand_left = _self_join(lng.select("id", "pfx", left_key.alias("k")))
    cand_right = _self_join(lng.select("id", "pfx", right_key.alias("k")))

    # short band: prefixes shorter than the two segments can cover.
    # Pair lengths differ by at most 1, so the probe side fans each row
    # to the bands (l-1, l, l+1) — an equi-join on the band id against
    # the build side keyed by its own length, never a cross join.
    sht = p.where(F.col("l") <= long_min)
    sa = sht.select(
        F.explode(
            F.array(F.col("l") - 1, F.col("l"), F.col("l") + 1)
        ).alias("band"),
        F.col("id").alias("id_a"), F.col("pfx").alias("pfx_a"),
    )
    sb = sht.select(
        F.col("l").alias("band"),
        F.col("id").alias("id_b"), F.col("pfx").alias("pfx_b"),
    )
    cand_short = sa.join(sb, "band").where(F.col("id_a") < F.col("id_b")).drop("band")

    cand = cand_left.unionByName(cand_right).unionByName(cand_short).dropDuplicates(
        ["id_a", "id_b"]
    )
    dist = F.levenshtein("pfx_a", "pfx_b")
    return cand.where(dist <= 1).select(
        F.col("id_a"), F.col("id_b"), "pfx_a", "pfx_b",
        dist.cast("int").alias("edit_distance"),
    )
