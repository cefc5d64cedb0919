"""S-H-ESD detector tests: t-distribution math vs known table values,
GESD on planted outliers, Spark end-to-end on the ticker fixture."""

from __future__ import annotations

import numpy as np
import pytest

from anomaly_detection_spark.detect.sesd import (
    gesd_outliers, shesd_detect, t_cdf, t_ppf,
)
from tests.ticker_fixture import SPIKE_KEY, SHORT_KEY, fixture_df


def test_t_quantiles_match_tables():
    # standard two-sided 95% critical values
    assert t_ppf(0.975, 10) == pytest.approx(2.2281, abs=2e-4)
    assert t_ppf(0.975, 30) == pytest.approx(2.0423, abs=2e-4)
    assert t_ppf(0.95, 5) == pytest.approx(2.0150, abs=2e-4)
    assert t_ppf(0.995, 20) == pytest.approx(2.8453, abs=2e-4)
    # symmetry and CDF inverse consistency
    assert t_ppf(0.025, 10) == pytest.approx(-t_ppf(0.975, 10), abs=1e-9)
    assert t_cdf(t_ppf(0.9, 7), 7) == pytest.approx(0.9, abs=1e-9)


def test_gesd_finds_planted_outliers():
    rng = np.random.default_rng(42)
    x = rng.normal(0, 1, 100)
    x[10] = 12.0
    x[50] = -9.0
    found = set(gesd_outliers(x, max_outliers=5))
    assert {10, 50} <= found
    assert len(found) <= 3  # no mass false positives
    # clean data → nothing significant
    clean = rng.normal(0, 1, 100)
    assert len(gesd_outliers(clean, max_outliers=5)) == 0


def test_gesd_direction():
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, 80)
    x[5] = 10.0
    x[6] = -10.0
    assert 5 in gesd_outliers(x, 4, direction="pos")
    assert 6 not in gesd_outliers(x, 4, direction="pos")
    assert 6 in gesd_outliers(x, 4, direction="neg")


def test_shesd_on_fixture(spark):
    df = fixture_df(spark)
    out = shesd_detect(
        df, ["index_id", "granularity_item_id"],
        "data_timestamp", "data_value", max_anoms=0.1,
    ).collect()
    hits = {(r.index_id, r.granularity_item_id) for r in out}
    assert SPIKE_KEY in hits            # the ×10 spike is caught
    assert SHORT_KEY not in hits        # short series skipped (< 2 periods)
    spike_rows = [r for r in out if (r.index_id, r.granularity_item_id) == SPIKE_KEY]
    assert any(r.value > 1000 for r in spike_rows)
