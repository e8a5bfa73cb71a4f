"""Oracle spot-check at sf0.1 — the fixture-shift regression net.

The whole-corpus differential (test_oracle_corpus.py) runs at sf0.01,
where value RANGES are narrower: sf0.01's user_id tops out at 149,
sf0.1's at 1499; timestamps span differently; key densities differ. A
query whose predicate set silently depends on a fixture property can
match its oracle at sf0.01 and diverge at sf0.1 — exactly the round-7
stream_scd2_enrich finding (a LEFT-join change widened an implicit
user_id<200 restriction the oracle kept; invisible at sf0.01, a hash
mismatch at sf0.1). This module re-diffs a hand-picked subset of
range-sensitive entries at sf0.1 so that class of latent divergence
fails in CI, not in a future audit.

Kept to a subset because each entry pays a ~10x data pass: chosen for
predicates/windows tied to user ids, timestamps, watermarks or key
ranges — the fixture properties that move between scale factors.
"""

import duckdb
import pytest

from conftest import CORPUS, TESTDATA_TABLES, assert_matches_oracle

SF_LARGE = "/root/testdata/sf0.1"

# range-sensitive: user-id predicates, event-time windows, watermarks,
# validity ranges, hash-threshold sampling
SPOTCHECK = [
    "stream_scd2_enrich",       # dim-membership + validity-range join
    "stream_late_dlq",          # watermark arithmetic over the ts span
    "anomaly_rolling_zscore",   # rolling baseline over the hour series
    "corpus_domain_mix",        # integer hash thresholds per domain
    "join_asof",                # as-of matching over the ts range
    "timeseries_ohlc_resample", # bucket boundaries over the ts span
    "agg_approx_sample_estimate",  # deterministic hash-sample rates
    "join_salted_skew",         # skew profile changes with key density
]


@pytest.fixture(scope="module")
def duck_large():
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_LARGE}/{name}.parquet'"
        )
    yield con
    con.close()


_ORACLES = CORPUS.oracle_sql()


@pytest.mark.parametrize("name", SPOTCHECK)
def test_sf01_spotcheck(spark, duck_large, name):
    assert name in _ORACLES, f"{name} lost its oracle — spot-check is void"
    df = CORPUS.queries()[name](spark, SF_LARGE)
    assert_matches_oracle(df, duck_large, _ORACLES[name])
