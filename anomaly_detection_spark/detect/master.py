"""``master_anomaly_detector`` — the reference R engine's top-level
driver (``func.R:122-157``) rebuilt Spark-first.

Reference flow: distinct ticker list → SERIAL per-ticker
``detect_anomaly`` loop → rbind → split ``ticker_index`` back into
(index, region) → two left merges to the dim tables → 18-column
projection with renames (columns confirmed from the saved workspace,
SURVEY.md §1.2).

Here the serial loop is one ``applyInPandas`` pass (per-key parallel —
the reference's own "TODO: optimize time" fixed by construction) and
the merges are broadcast left joins. Output column order and names
match the reference's ``anomaly_df`` exactly:

data_timestamp, index, region, ticker_index, anomaly, value,
seven_day_avg, score, repetitions, frequency, alleged_freq,
granularity, granularity_desc, index_name, ticker, ticker_desc,
display_unit_type, documentation_url
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.config import DetectorConfig
from anomaly_detection_spark.detect.stl import stl_iqr_detect
from anomaly_detection_spark.operators.keys import concat_key


def master_anomaly_detector(
    ticker_data: DataFrame,
    ticker_gran: DataFrame,
    ticker_info: DataFrame,
    cfg: Optional[DetectorConfig] = None,
    period: int = 7,
    reference_quirks: bool = False,
) -> DataFrame:
    """Run the decomposition detector over every ticker and enrich with
    both dimension tables (func.R:139-150 projection/rename)."""
    cfg = cfg or DetectorConfig()
    fact = ticker_data
    if cfg.predicate is not None:
        fact = fact.where(cfg.predicate)
    if cfg.eval_ts:
        fact = fact.where(
            F.col("data_timestamp") <= F.lit(cfg.eval_ts).cast("timestamp_ntz")
        )

    detected = stl_iqr_detect(
        fact, ["index_id", "granularity_item_id"],
        "data_timestamp", "data_value",
        period=period, reference_quirks=reference_quirks,
    )
    detected = concat_key(
        detected, ["index_id", "granularity_item_id"], "ticker_index"
    ).withColumnRenamed("index_id", "index").withColumnRenamed(
        "granularity_item_id", "region"
    )

    gran = F.broadcast(
        ticker_gran.select(
            F.col("id").alias("_gran_id"),
            F.col("granularity1").alias("granularity"),
            F.col("Description").alias("granularity_desc"),
        )
    )
    info = F.broadcast(
        ticker_info.select(
            F.col("id").alias("_info_id"),
            "index_name",
            "ticker",
            F.col("description").alias("ticker_desc"),
            F.col("frequency").alias("alleged_freq"),
            "display_unit_type",
            "documentation_url",
        )
    )
    out = (
        detected.join(gran, detected["region"] == F.col("_gran_id"), "left")
        .join(info, detected["index"] == F.col("_info_id"), "left")
    )
    return out.select(
        "data_timestamp", "index", "region", "ticker_index", "anomaly",
        "value", "seven_day_avg", "score", "repetitions", "frequency",
        "alleged_freq", "granularity", "granularity_desc", "index_name",
        "ticker", "ticker_desc", "display_unit_type", "documentation_url",
    )
