"""Training-mixture sampling: draw a corpus of exactly ``total_n``
documents matching target domain weights (largest-remainder / Hamilton
apportionment), selecting deterministically within each domain.

The pretraining-data use case: a mixture spec like "40 % en, 20 % zh,
…" must become an exact document list that is reproducible across
engines, partitionings, and reruns — so no ``rand()``, no
``monotonically_increasing_id``, and no float arithmetic in the quota
law (one engine's ``0.4`` is DECIMAL, another's is binary double; their
``floor`` disagrees).  Weights are integer parts of an integer
denominator and the whole apportionment runs in exact integer space.
Selection within a domain orders by a portable md5 content hash (same
idiom as ``hash_split`` / ``cluster_balanced_sample``), which any
engine with md5 + hex parsing replicates bit-for-bit.

Scale shape: the apportionment runs on the per-domain COUNT table
(#domains rows — trivially small, broadcast back), and the per-domain
selection is one ``row_number`` window over the domain partitioning —
a single shuffle of the corpus at 100 TB.  A domain so hot it skews its
window task can be pre-split with the standard salt-and-restitch
(``operators/skew.py``); domain counts in real mixtures are few.

Quota law (documented, both engines implement it identically):
``ideal_d = total_n * parts_d / denom``; ``base_d = ideal_d DIV denom``
(integer); the ``total_n - sum(base)`` leftover units go to the largest
integer remainders ``(total_n * parts_d) MOD denom`` (ties broken by
domain name); finally ``quota_d`` is capped at the domain's available
count — a shortfall is NOT redistributed (the caller asked for at most
``parts_d/denom`` of domain ``d``; silently backfilling from other
domains would corrupt the mixture).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _md5_rank64(salt: str, key) -> F.Column:
    """Portable 60-bit integer from md5 — identical in DuckDB via
    ``CAST('0x' || substr(md5(salt || x), 1, 15) AS BIGINT)``."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string")).cast("binary")), 1, 15),
        16, 10,
    ).cast("bigint")


def mixture_quotas(
    counts: DataFrame,
    parts: Mapping[str, int],
    total_n: int,
    denom: int | None = None,
    domain_col: str = "domain",
    count_col: str = "n_avail",
) -> DataFrame:
    """Largest-remainder quotas over a (domain, count) table, in exact
    integer arithmetic.  ``parts`` are integer weight numerators;
    ``denom`` defaults to ``sum(parts)``.

    Returns (domain, n_avail, quota).  Domains absent from ``parts``
    get part 0 (quota 0 — excluded from the mixture).
    """
    denom = int(denom if denom is not None else sum(parts.values()))
    if denom <= 0:
        raise ValueError("weights must sum to a positive denominator")
    # The counts relation is #domains rows — metadata, not data.  Pull
    # it to the driver (like a Bloom bitmap or IVF centroid set) and
    # run the quota law in exact Python integers; the result broadcasts
    # back as a literal table, so the quota side contributes ZERO
    # exchanges to the plan.  The law seeds from the WEIGHTS, not just
    # observed domains: a weighted domain with zero available rows
    # still consumes its base units (quota capped at 0, units lost,
    # never redistributed).
    avail = {
        r[0]: int(r[1])
        for r in counts.select(domain_col, count_col).collect()
    }
    domains = sorted(set(avail) | set(parts))
    numer = {d: int(parts.get(d, 0)) * int(total_n) for d in domains}
    base = {d: numer[d] // denom for d in domains}
    rem = {d: numer[d] % denom for d in domains}
    leftover = int(total_n) - sum(base.values())
    for d in sorted(domains, key=lambda d: (-rem[d], d))[:max(leftover, 0)]:
        base[d] += 1
    rows = [
        (d, avail.get(d, 0), min(base[d], avail.get(d, 0))) for d in domains
    ]
    return counts.sparkSession.createDataFrame(
        rows, "domain string, n_avail long, quota long"
    )


def weighted_mixture_sample(
    df: DataFrame,
    parts: Mapping[str, int],
    total_n: int,
    denom: int | None = None,
    domain_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix:",
) -> DataFrame:
    """Deterministic mixture draw: per-domain md5-hash order, cut at the
    largest-remainder quota.  Output: (id, domain, sample_rank, quota).
    """
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_avail")
    )
    quotas = mixture_quotas(counts, parts, total_n, denom)
    hx = _md5_rank64(salt, F.col(id_col))
    wd = Window.partitionBy(domain_col).orderBy(hx.asc(), F.col(id_col).asc())
    ranked = df.select(
        F.col(id_col), F.col(domain_col).alias("domain"),
        F.row_number().over(wd).alias("sample_rank"),
    )
    return (
        ranked.join(F.broadcast(quotas), "domain")
        .where(F.col("sample_rank") <= F.col("quota"))
        .select(id_col, "domain", "sample_rank", "quota")
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int = 50,
    salt: str = "wrs:",
    key_round: int = 9,
) -> DataFrame:
    """Weighted random sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, the exponential-jumps formulation): each row draws a
    deterministic uniform u from its content hash and competes with
    key = -ln(u) / weight; the k SMALLEST keys are the sample.  The
    inclusion law is exactly weighted sampling without replacement,
    and — because u comes from a salted md5, not ``rand()`` — the draw
    is reproducible across retries, partitionings, and engines.

    The key is rounded to a 1e-9 grid with an id tie-break so the
    selection boundary is stable cross-engine (libm ln agrees to the
    grid on non-adversarial inputs; ties broken by id are exact).

    Distributed shape: map-only key computation, then a
    TakeOrderedAndProject top-k (per-partition heaps, driver merges
    k·P rows) — no global sort exchange at any input size.

    Returns (id_col, weight_col, sample_key) for the k sampled rows.
    """
    hexed = F.md5(
        F.concat(F.lit(salt), F.col(id_col).cast("string")).cast("binary")
    )
    # uniform in (0, 1]: 60 md5 bits scaled; +1 avoids ln(0)
    u = (F.conv(F.substring(hexed, 1, 15), 16, 10).cast("double") + 1.0) / float(16 ** 15)
    key = F.round(-F.log(u) / F.col(weight_col).cast("double"), key_round)
    return (
        # weight <= 0 means zero inclusion probability in E-S (the key
        # -ln(u)/w is undefined) — exclude explicitly rather than rely
        # on engine-specific /0 behavior: ANSI Spark THROWS on double
        # division by zero where DuckDB yields a NULL key that merely
        # sorts last.  Found by the adversarial documents fixture
        # (n_chars = 0 empty doc) in round 9.
        df.where(F.col(weight_col) > 0)
        .select(id_col, weight_col, key.alias("sample_key"))
        .orderBy("sample_key", id_col)
        .limit(k)
    )
