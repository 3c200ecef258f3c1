"""Seen-set tests: Bloom property tests (zero false negatives, bounded FPR),
union evolution, cogrouped vs broadcast probe parity, tiered dedup equals
plain anti-join (the reference's unique-index upsert semantics)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from metadata_crawler_spark.functions.urls import with_url_hash
from metadata_crawler_spark.operators.seen import (
    bloom_build,
    bloom_params,
    bloom_union,
    dedup_against_seen,
    probe_cogrouped,
    probe_with_broadcast,
)

N_SHARDS = 8


@pytest.fixture(scope="module")
def keys(spark):
    df = spark.range(0, 4000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 97), F.lit(".example.com/p/"), "id").alias("url")
    )
    return with_url_hash(df).cache()


def test_bloom_params_sane():
    m, k = bloom_params(1000, 0.01)
    assert m % 8 == 0 and m > 9000
    assert 1 <= k <= 16


def test_zero_false_negatives_and_fpr(spark, keys):
    inserted = keys.filter(F.col("url_hash_hi") % 2 == 0)
    absent = keys.filter(F.col("url_hash_hi") % 2 != 0)
    bloom = bloom_build(inserted, N_SHARDS, fpr=0.01).cache()
    probed_in = probe_with_broadcast(inserted, bloom)
    assert probed_in.filter(~F.col("maybe_seen")).count() == 0  # no false negatives
    fp = probe_with_broadcast(absent, bloom).filter(F.col("maybe_seen")).count()
    fpr = fp / max(1, absent.count())
    assert fpr < 0.05  # target 0.01, generous bound


def test_cogrouped_probe_matches_broadcast(spark, keys):
    inserted = keys.limit(1500)
    bloom = bloom_build(inserted, N_SHARDS, fpr=0.01).cache()
    a = probe_with_broadcast(keys, bloom).select("url", "maybe_seen")
    b = probe_cogrouped(keys, bloom, N_SHARDS).select("url", "maybe_seen")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bloom_union_is_or(spark, keys):
    first = keys.filter(F.col("url_hash_lo") % 3 == 0)
    second = keys.filter(F.col("url_hash_lo") % 3 == 1)
    m_exp = 2 * 4000 // N_SHARDS
    b1 = bloom_build(first, N_SHARDS, 0.01, expected_per_shard=m_exp)
    b2 = bloom_build(second, N_SHARDS, 0.01, expected_per_shard=m_exp)
    merged = bloom_union(b1, b2).cache()
    both = first.unionByName(second)
    missed = probe_with_broadcast(both, merged).filter(~F.col("maybe_seen")).count()
    assert missed == 0


def test_dedup_tiers_equal_plain_antijoin(spark, keys):
    seen = keys.filter(F.col("url_hash_hi") % 5 == 0).select(
        "url_hash_hi", "url_hash_lo"
    )
    bloom = bloom_build(seen, N_SHARDS, 0.01)
    tiered = dedup_against_seen(keys, seen, bloom, N_SHARDS).select("url")
    plain = dedup_against_seen(keys, seen, None).select("url")
    assert tiered.exceptAll(plain).count() == 0
    assert plain.exceptAll(tiered).count() == 0


def test_empty_bloom_everything_new(spark, keys):
    sample = keys.limit(100)
    empty_bloom = bloom_build(sample.limit(0), N_SHARDS, 0.01, expected_per_shard=64)
    out = dedup_against_seen(sample, None, empty_bloom, N_SHARDS)
    assert out.count() == 100


# ---------------------------------------------------------------------------
# cuckoo-filter tier
# ---------------------------------------------------------------------------


def _cuckoo_imports():
    from metadata_crawler_spark.operators.seen import (
        cuckoo_build,
        cuckoo_delete,
        cuckoo_insert,
        cuckoo_probe_broadcast,
        cuckoo_probe_cogrouped,
    )

    return (
        cuckoo_build, cuckoo_delete, cuckoo_insert,
        cuckoo_probe_broadcast, cuckoo_probe_cogrouped,
    )


def test_cuckoo_zero_false_negatives_and_fpr(spark, keys):
    build, _, _, probe_b, _ = _cuckoo_imports()
    ck = build(keys, n_shards=N_SHARDS).cache()
    probed = probe_b(keys, ck)
    assert probed.filter(~F.col("maybe_seen")).count() == 0  # no false negs
    fresh = with_url_hash(
        spark.range(100_000, 104_000).select(
            F.concat(F.lit("https://new"), (F.col("id") % 31),
                     F.lit(".example.org/x/"), "id").alias("url")
        )
    )
    fp = probe_b(fresh, ck).filter("maybe_seen").count()
    assert fp / 4000 < 0.01  # 16-bit fingerprints: fpr well under 1%


def test_cuckoo_cogrouped_matches_broadcast(spark, keys):
    build, _, _, probe_b, probe_c = _cuckoo_imports()
    ck = build(keys, n_shards=N_SHARDS).cache()
    mixed = keys.unionByName(
        with_url_hash(
            spark.range(0, 500).select(
                F.concat(F.lit("https://other.example.net/"), "id").alias("url")
            )
        )
    )
    a = sorted(r.url for r in probe_b(mixed, ck).filter("maybe_seen").collect())
    b = sorted(r.url for r in probe_c(mixed, ck, N_SHARDS).filter("maybe_seen").collect())
    assert a == b


def test_cuckoo_delete_evicts(spark, keys):
    build, delete, _, probe_b, _ = _cuckoo_imports()
    ck = build(keys, n_shards=N_SHARDS)
    purged = keys.filter(F.col("url").endswith("/p/7")).cache()
    kept = keys.subtract(purged)
    ck2 = delete(ck, purged).cache()
    # kept keys: still zero false negatives
    assert probe_b(kept, ck2).filter(~F.col("maybe_seen")).count() == 0
    # purged keys: gone (16-bit fp collisions could leave stragglers, but
    # on this fixture the filter is sparse enough for an exact assert)
    assert probe_b(purged, ck2).filter("maybe_seen").count() == 0


def test_cuckoo_insert_evolution(spark, keys):
    build, _, insert, probe_b, _ = _cuckoo_imports()
    old = keys.filter(F.col("url_hash_hi") % 2 == 0).cache()
    new = keys.subtract(old).cache()
    ck = insert(build(old, n_shards=N_SHARDS,
                      expected_per_shard=2000), new).cache()
    assert probe_b(keys, ck).filter(~F.col("maybe_seen")).count() == 0
    # n_items accounting survives the round trip
    total = sum(r.n_items for r in ck.collect())
    assert total == keys.count()


def test_cuckoo_dedup_matches_plain_antijoin(spark, keys):
    build, _, _, _, _ = _cuckoo_imports()
    seen = keys.filter(F.col("url_hash_lo") % 3 == 0).cache()
    ck = build(seen, n_shards=N_SHARDS).cache()
    want = sorted(
        r.url for r in dedup_against_seen(keys, seen, None).collect()
    )
    for broadcast in (True, False):
        got = sorted(
            r.url
            for r in dedup_against_seen(
                keys, seen, None, n_shards=N_SHARDS,
                broadcast_bloom=broadcast, cuckoo=ck,
            ).collect()
        )
        assert got == want


def test_cuckoo_empty_table_geometry(spark, keys):
    """A zero-key build pins the shard geometry (one zeroed table per
    shard), and mutating an EMPTY standing table — which carries no
    geometry at all — fails loud instead of inventing 32/1024 defaults
    that would mis-shard keys and yield silent false negatives."""
    import pytest

    build, _, insert, probe_b, probe_c = _cuckoo_imports()
    zero = keys.limit(0)
    ck0 = build(zero, n_shards=N_SHARDS, expected_per_shard=2000).cache()
    rows = ck0.collect()
    assert len(rows) == N_SHARDS
    assert all(r.n_shards == N_SHARDS and r.n_items == 0 for r in rows)
    # geometry survives: insert into the zero-key build, then probe at
    # the fleet's real shard count — no false negatives
    ck1 = insert(ck0, keys).cache()
    assert probe_b(keys, ck1).filter(~F.col("maybe_seen")).count() == 0
    assert (
        probe_c(keys, ck1, N_SHARDS).filter(~F.col("maybe_seen")).count() == 0
    )
    # a truly EMPTY standing frame (no geometry to honor) refuses mutation
    with pytest.raises(ValueError, match="EMPTY standing table"):
        insert(ck0.limit(0), keys)


def test_cogrouped_probe_survives_geometry_drift(spark, keys):
    """The no-false-negative contract under config drift: a resume that
    changes CrawlConfig.n_shards must not shard candidates by the NEW
    count against a filter built with the OLD one — the probe reads the
    geometry from the table (the broadcast path's 'carried in the
    table, never inferred' rule), so the caller's stale value is only
    an empty-filter fallback."""
    inserted = keys.limit(1500)
    bloom = bloom_build(inserted, N_SHARDS, fpr=0.01).cache()
    drifted = probe_cogrouped(inserted, bloom, N_SHARDS * 4)
    assert drifted.filter(~F.col("maybe_seen")).count() == 0
